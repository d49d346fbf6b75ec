"""Cross-round regression pin: the full gtsam-mode pipeline on a fixed
synthetic seed must keep producing the committed poses and map.

If an optimization legitimately changes numerics (not semantics), this will
trip — regenerate the golden consciously (see tests/goldens/) and say why
in the commit message. Exact-map equality is the point: every map-path
optimization so far (compaction, closed-form Bresenham, adaptive K) was
bit-preserving, and this keeps it that way.
"""

import os

import numpy as np
import pytest

from lidar_slam_tpu.config import MapConfig, PoseGraphConfig, SlamConfig
from lidar_slam_tpu.models import slam
from lidar_slam_tpu.utils import io

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "pipeline_seed2024.npz")


@pytest.mark.slow
def test_pipeline_matches_golden_snapshot():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden missing")
    want = np.load(GOLDEN)

    d = io.synthetic_dataset(n_steps=30, n_rays=1081, seed=2024)
    cfg = SlamConfig(
        map=MapConfig(resolution=0.25, world_max_x=25, world_min_x=-25,
                      world_max_y=25, world_min_y=-25),
        # cost_rtol pinned at the tolerance the golden was generated with
        # (the shipped config default has since moved to GTSAM's 1e-5;
        # this test pins numerics, not the stopping-rule semantics)
        pose_graph=PoseGraphConfig(max_lm_iters=10, cg_iters=50,
                                   cost_rtol=1e-7))
    res = slam.run_slam(d["encoder"]["counts"], d["imu"]["angular_velocity"],
                        d["lidar"]["ranges"], 0.1, 30.0, mode="gtsam",
                        filter_lidar=True, cfg=cfg, build_map=True,
                        chunk_size=16)

    np.testing.assert_allclose(res.poses_odom, want["poses_odom"], atol=1e-10)
    np.testing.assert_allclose(res.poses, want["poses"], atol=1e-7)
    np.testing.assert_allclose(res.logodds, want["logodds"], atol=1e-6)
    np.testing.assert_array_equal(res.grid_map, want["grid_map"])
