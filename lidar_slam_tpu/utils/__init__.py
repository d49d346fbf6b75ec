from . import (io, logging, metrics, plotting, png, precision,  # noqa: F401
               profiling, se2)
