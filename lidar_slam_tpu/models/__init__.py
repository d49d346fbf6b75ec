from . import (occupancy, odometry, particle_filter,  # noqa: F401
               pf_slam, pose_graph, scan_matching, slam, texture, warmup)
