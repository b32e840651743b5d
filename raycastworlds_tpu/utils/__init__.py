from . import checkpoint, debug, profiling, viewer  # noqa: F401
