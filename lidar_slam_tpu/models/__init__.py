from . import (occupancy, odometry, pose_graph, scan_matching, slam,  # noqa: F401
               texture, warmup)
