from . import io, plotting, png, precision, profiling, se2  # noqa: F401
