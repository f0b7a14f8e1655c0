from . import io, profiling, validate  # noqa: F401
