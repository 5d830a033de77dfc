from . import debug, profiling  # noqa: F401
