"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The multi-chip sharding paths are validated the standard JAX way — N virtual
CPU devices via ``--xla_force_host_platform_device_count`` — so no real
multi-chip slice is needed.  ``jax.config.update`` (not the env var) is
required because the environment's sitecustomize pins ``jax_platforms``
explicitly, which outranks ``JAX_PLATFORMS``.
"""

import os

_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
