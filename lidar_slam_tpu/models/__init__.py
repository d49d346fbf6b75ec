from . import (occupancy, odometry, particle_filter,  # noqa: F401
               pf_slam, pose_graph, relocalization, scan_matching, slam,
               texture, warmup)
