from . import (occupancy, odometry, particle_filter,  # noqa: F401
               pose_graph, scan_matching, slam, texture, warmup)
