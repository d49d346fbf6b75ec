"""Oracle tests: run the ACTUAL reference implementation (read-only import
from /root/reference) on identical inputs and assert our TPU-native ops
reproduce it. Strongest possible parity evidence — no hand-written spec
model in between. Skipped wholesale when the reference tree is absent.

The gtsam stage has no importable oracle here (gtsam is not installed);
its parity is covered by the scipy least_squares cross-check in
test_pose_graph.py instead.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "modules")),
                                reason="reference tree unavailable")

if os.path.isdir(os.path.join(REF, "modules")):
    sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def ref():
    import modules.icp as ricp
    import modules.localization as rloc
    import modules.ogm as rogm
    import modules.utils as rutils

    return {"icp": ricp, "loc": rloc, "ogm": rogm, "utils": rutils}


def test_odometry_matches_reference(ref):
    from lidar_slam_tpu.models import odometry

    rng = np.random.default_rng(0)
    n = 150
    counts = rng.normal(size=(n, 4)) * 5 + 10
    gyro = rng.normal(size=(n, 3)) * 0.1 + 0.01

    want, want_rel = ref["loc"].poses_from_odometry(
        counts, gyro, return_relative_poses=True)
    got, got_rel = odometry.poses_from_odometry(
        jnp.asarray(counts), jnp.asarray(gyro), return_relative_poses=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)
    # reference returns 4x4? no - get_relative_pose returns 3x3 SE(2)
    np.testing.assert_allclose(np.asarray(got_rel), np.asarray(want_rel),
                               atol=1e-9)


def test_lidar_preprocessing_matches_reference(ref):
    from lidar_slam_tpu.config import LidarConfig
    from lidar_slam_tpu.ops import scan as scan_ops

    rng = np.random.default_rng(1)
    ranges = rng.uniform(0.0, 35.0, (6, 1081))
    want_list = ref["loc"].get_lidar_data(ranges, 0.1, 30.0)

    pts, mask = scan_ops.scans_to_points(jnp.asarray(ranges), 0.1, 30.0,
                                         LidarConfig())
    pts, mask = np.asarray(pts), np.asarray(mask)
    for i in range(6):
        np.testing.assert_allclose(pts[i][mask[i]], want_list[i], atol=1e-9)


def test_run_icp_matches_reference(ref):
    from lidar_slam_tpu.ops import icp as icp_ops

    rng = np.random.default_rng(2)
    src = rng.normal(size=(180, 3)) * [1, 1, 0.3]
    yaw = 0.12
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    tgt = src @ R.T + [0.2, -0.1, 0.0] + rng.normal(0, 0.01, src.shape)

    for normalize, eps in [(False, 1e-3), (True, 1e-2)]:
        want_T, want_err = ref["icp"].run_icp(
            src, tgt, init_transform=np.eye(4), epsilon=eps,
            return_error=True, normalize_error=normalize)
        got = icp_ops.run_icp(jnp.asarray(src), jnp.asarray(tgt),
                              jnp.asarray(np.eye(4)), epsilon=eps,
                              normalize_error=normalize)
        np.testing.assert_allclose(np.asarray(got.T), want_T, atol=1e-7,
                                   err_msg=f"normalize={normalize}")
        np.testing.assert_allclose(float(got.error), want_err, atol=1e-9)


def test_scan_matching_matches_reference(ref):
    from lidar_slam_tpu.config import IcpConfig
    from lidar_slam_tpu.models import scan_matching

    rng = np.random.default_rng(3)
    n, P = 6, 100
    gt = np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0)
    world = rng.uniform(-4, 4, (350, 2))
    scans = []
    for i in range(n):
        c, s = np.cos(gt[i, 2]), np.sin(gt[i, 2])
        local = (world - gt[i, :2]) @ np.array([[c, s], [-s, c]]).T
        scans.append(local[rng.choice(350, P, replace=False)])
    odom = gt + rng.normal(0, 0.01, gt.shape)

    want, want_rel = ref["loc"].poses_from_scan_matching(
        odom, scans, return_relative_poses=True)

    got = scan_matching.poses_from_scan_matching(
        jnp.asarray(odom), jnp.asarray(np.stack(scans)),
        jnp.ones((n, P), bool), IcpConfig(epsilon=0.001), chunk_size=3)
    np.testing.assert_allclose(np.asarray(got.poses), want, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.relative_poses),
                               np.asarray(want_rel), atol=1e-7)


def test_ogm_matches_reference(ref):
    from lidar_slam_tpu.config import MapConfig
    from lidar_slam_tpu.models import occupancy

    rng = np.random.default_rng(4)
    n_scans, n_rays = 4, 80
    states = np.cumsum(rng.normal(0, 0.2, (n_scans, 3)), axis=0)
    meas = []
    for _ in range(n_scans):
        ang = rng.uniform(-np.pi, np.pi, n_rays)
        r = rng.uniform(0.3, 12.0, n_rays)  # some rays off the 8 m map
        meas.append(np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1))

    rmap = ref["ogm"].OccupancyGridMap(0.1, 8, 8, -8, -8)
    rmap.build_map(states, meas)

    cfg = MapConfig(resolution=0.1, world_max_x=8, world_min_x=-8,
                    world_max_y=8, world_min_y=-8)
    assert (cfg.width, cfg.height) == rmap.grid_map_log_odds.shape
    K = occupancy.max_ray_cells(cfg, 14.0)
    got = occupancy.build_logodds(
        jnp.asarray(states), jnp.asarray(np.stack(meas)),
        jnp.ones((n_scans, n_rays), bool), cfg, K)
    np.testing.assert_allclose(np.asarray(got), rmap.grid_map_log_odds,
                               atol=1e-4)
    got_grid = np.asarray(occupancy.finalize_grid(got))
    np.testing.assert_array_equal(got_grid, rmap.grid_map)


def test_bresenham_matches_reference(ref):
    from lidar_slam_tpu.ops.bresenham import bresenham_cells

    rogm = ref["ogm"].OccupancyGridMap(1.0, 5, 5, -5, -5)
    rng = np.random.default_rng(5)
    for _ in range(60):
        sx, sy, ex, ey = rng.integers(-80, 80, 4)
        want = rogm.bresenham2D(int(sx), int(sy), int(ex), int(ey))
        got = np.asarray(bresenham_cells(int(sx), int(sy), int(ex), int(ey)))
        np.testing.assert_array_equal(got, want)


def test_filters_match_reference(ref):
    from lidar_slam_tpu.ops import filters

    rng = np.random.default_rng(6)
    scans = []
    for _ in range(3):
        blob = rng.normal(0, 0.02, (70, 2)) + rng.uniform(-2, 2, 2)
        outs = rng.uniform(4, 9, (8, 2)) * rng.choice([-1, 1], (8, 2))
        scans.append(np.vstack([blob, outs]))

    want = ref["loc"].DBSCAN_outliers_removal(scans, eps=0.1, min_samples=10)
    want = ref["loc"].statistical_outliers_removal(want, k_std=2)

    pts = jnp.asarray(np.stack(scans))
    masks = jnp.ones(pts.shape[:2], bool)
    m1 = filters.dbscan_filter_scans(pts, masks, eps=0.1, min_samples=10)
    m2 = filters.statistical_filter_scans(pts, m1, k_std=2.0)
    m2 = np.asarray(m2)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(pts[i])[m2[i]], want[i],
                                   atol=1e-12)


def test_pose_algebra_matches_reference(ref):
    from lidar_slam_tpu.utils import se2

    rng = np.random.default_rng(7)
    for _ in range(10):
        p1, p2 = rng.normal(size=3), rng.normal(size=3)
        np.testing.assert_allclose(
            np.asarray(se2.T_from_pose(jnp.asarray(p1))),
            ref["utils"].T_from_pose(p1), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(se2.get_relative_pose(jnp.asarray(p1), jnp.asarray(p2))),
            ref["utils"].get_relative_pose(p1, p2), atol=1e-10)
        T2 = ref["utils"].T_from_pose(p1)
        np.testing.assert_allclose(
            np.asarray(se2.TSE3_from_TSE2(jnp.asarray(T2))),
            ref["utils"].TSE3_from_TSE2(T2), atol=1e-12)


def test_map_correlation_matches_reference():
    sys.path.insert(0, os.path.join(REF, "code"))
    import importlib
    import matplotlib
    matplotlib.use("Agg")  # pr2_utils calls plt.ion() at import
    pr2 = importlib.import_module("pr2_utils")

    from lidar_slam_tpu.ops import correlation

    rng = np.random.default_rng(8)
    im = (rng.random((81, 81)) > 0.6).astype(np.int8)
    x_im = np.linspace(-2, 2, 81)
    y_im = np.linspace(-2, 2, 81)
    vp = rng.uniform(-2.5, 2.5, (2, 300))
    offs = np.arange(-0.2, 0.2 + 0.05, 0.05)
    want = pr2.mapCorrelation(im, x_im, y_im, vp, offs, offs)
    got = np.asarray(correlation.map_correlation(
        jnp.asarray(im), jnp.asarray(x_im), jnp.asarray(y_im),
        jnp.asarray(vp), jnp.asarray(offs), jnp.asarray(offs)))
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_voxel_downsample_matches_reference(ref):
    from lidar_slam_tpu.ops.voxel import voxel_downsample

    rng = np.random.default_rng(9)
    pc = rng.normal(0, 1.0, (400, 3))
    want = ref["icp"].voxel_downsample(pc, 0.4)
    got = voxel_downsample(pc, 0.4)
    np.testing.assert_allclose(got, want, atol=1e-10)
