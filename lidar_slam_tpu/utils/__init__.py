from . import io, logging, plotting, png, precision, profiling, se2  # noqa: F401
