from . import units, collision, raycast, render, sampling  # noqa: F401
