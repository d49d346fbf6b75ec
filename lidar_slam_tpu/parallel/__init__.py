from . import mesh, sharding, superstep  # noqa: F401
