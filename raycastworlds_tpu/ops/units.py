"""Unit conversions and navigation primitives.

Reference: /root/reference/src/utils.jl:5-17.  The reference is 1-indexed
(``wu_to_tu(x) = floor(x) + 1``); this package is 0-indexed throughout, so the
``+1`` disappears — tile ``i`` spans world units ``[i, i+1)`` and pixel ``p``
spans ``[p/ppu, (p+1)/ppu)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def wu_to_tu(x_wu):
    """World units -> tile index (0-indexed).  Ref: utils.jl:5."""
    return jnp.floor(x_wu).astype(jnp.int32)


def wu_to_pu(x_wu, pu_per_wu):
    """World units -> pixel index (0-indexed).  Ref: utils.jl:6."""
    return jnp.floor(x_wu * pu_per_wu).astype(jnp.int32)


def pu_to_tu(i_pu, pu_per_tu):
    """Pixel index -> tile index (0-indexed).  Ref: utils.jl:7."""
    return i_pu // pu_per_tu


def turn_left(direction_au, num_directions):
    """+1 angle unit, modular.  Ref: utils.jl:13."""
    return jnp.mod(direction_au + 1, num_directions)


def turn_right(direction_au, num_directions):
    """-1 angle unit, modular.  Ref: utils.jl:14."""
    return jnp.mod(direction_au - 1, num_directions)


def move_forward(position_wu, direction_wu, position_increment_wu):
    """Ref: utils.jl:16."""
    return position_wu + position_increment_wu * direction_wu


def move_backward(position_wu, direction_wu, position_increment_wu):
    """Ref: utils.jl:17."""
    return position_wu - position_increment_wu * direction_wu
