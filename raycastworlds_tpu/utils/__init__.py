from . import checkpoint, profiling, viewer  # noqa: F401
