from . import io, se2  # noqa: F401
