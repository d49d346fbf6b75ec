"""End-to-end SLAM pipeline orchestration.

Capability parity with the reference driver flow (reference: main.py:67-247):
load -> synchronize -> scan prep -> optional filters -> odometry ->
[scan matching] -> [pose graph with fixed-interval loop closures] ->
occupancy grid -> [texture map]. Host code touches only file IO; every
compute stage is jitted device code over fixed-shape masked arrays.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops import icp as icp_ops
from ..ops import scan as scan_ops
from ..utils import se2
from . import occupancy, odometry, pose_graph, scan_matching


@dataclasses.dataclass
class SlamResult:
    poses_odom: np.ndarray
    relative_poses_odom: np.ndarray
    poses: np.ndarray  # final poses for the selected mode
    poses_scan_matching: Optional[np.ndarray] = None
    relative_poses_scan_matching: Optional[np.ndarray] = None
    poses_optimized: Optional[np.ndarray] = None
    n_loop_closures: int = 0
    logodds: Optional[np.ndarray] = None
    grid_map: Optional[np.ndarray] = None


def loop_closure_candidates(n_poses: int, fixed_interval: int) -> np.ndarray:
    """Candidate indices i for closures (i, i+interval)
    (reference: main.py:161)."""
    return np.arange(0, n_poses - fixed_interval, fixed_interval)


@partial(jax.jit, static_argnames=("fixed_interval", "chunk_size"))
def compute_loop_closures(
    points3: jnp.ndarray,
    masks: jnp.ndarray,
    cand: np.ndarray,
    fixed_interval: int,
    max_distance: float,
    max_yaw_deg: float,
    chunk_size: int = 64,
):
    """Fixed-interval loop-closure ICPs, batched, with the reference gate.

    Matches main.py:161-172: identity-seeded ICP of scan i onto scan
    i+interval with NORMALIZED error and the reference's default epsilon
    (0.01); accepted when translation < max_distance and signed angle in
    degrees < max_yaw (the reference gates the signed angle, not its
    absolute value — replicated faithfully).
    """
    src = points3[cand]
    tgt = points3[cand + fixed_interval]
    sm = masks[cand]
    tm = masks[cand + fixed_interval]
    B = src.shape[0]
    eye = jnp.tile(jnp.eye(4, dtype=points3.dtype), (B, 1, 1))
    T_icp, errors, iters = scan_matching.icp_all_pairs(
        src, tgt, sm, tm, eye,
        epsilon=0.01, normalize_error=True, chunk_size=chunk_size,
        planar=True)
    T2 = se2.TSE2_from_TSE3(T_icp)
    angle = jnp.arctan2(T2[:, 1, 0], T2[:, 0, 0])
    translation = jnp.linalg.norm(T2[:, :2, 2], axis=-1)
    accept = (translation < max_distance) & (jnp.rad2deg(angle) < max_yaw_deg)
    return T2, accept, errors, iters


def resume_from_poses(
    poses: np.ndarray,
    ranges: np.ndarray,
    range_min: float,
    range_max: float,
    filter_lidar: bool = False,
    cfg: SlamConfig = SlamConfig(),
    build_map: bool = True,
) -> SlamResult:
    """Checkpoint/resume: rebuild maps from a saved pose trajectory.

    The pipeline checkpoints each stage's poses to outputs/*.npy (like the
    reference, main.py:110-189); this entry point restarts from any of those
    arrays, skipping pose estimation entirely (SURVEY.md section 5
    checkpoint/resume)."""
    poses = jnp.asarray(poses)
    points, masks = scan_ops.scans_to_points(
        jnp.asarray(ranges), range_min, range_max, cfg.lidar)
    if filter_lidar:
        from ..ops import filters
        masks = filters.dbscan_filter_scans(
            points, masks, eps=cfg.filter.dbscan_eps,
            min_samples=cfg.filter.dbscan_min_samples)
        masks = filters.statistical_filter_scans(
            points, masks, k_std=cfg.filter.statistical_k_std)

    result = SlamResult(
        poses_odom=np.asarray(poses),
        relative_poses_odom=np.asarray(
            se2.get_relative_pose(poses[:-1], poses[1:])),
        poses=np.asarray(poses),
    )
    if build_map:
        K = occupancy.adaptive_ray_cells(points, masks, cfg.map,
                                         float(range_max))
        logodds = occupancy.build_logodds(poses, points, masks, cfg.map, K)
        result.logodds = np.asarray(logodds)
        result.grid_map = np.asarray(occupancy.finalize_grid(logodds))
    return result


def run_slam(
    counts: np.ndarray,
    gyro: np.ndarray,
    ranges: np.ndarray,
    range_min: float,
    range_max: float,
    mode: str = "odom",
    filter_lidar: bool = False,
    fixed_interval: int = 10,
    cfg: SlamConfig = SlamConfig(),
    build_map: bool = True,
    chunk_size: int = 64,
) -> SlamResult:
    """Run the SLAM pipeline on synchronized sensor arrays.

    counts (N, 4) encoder; gyro (N, 3); ranges (N, n_rays) synchronized
    lidar. Modes mirror the reference CLI: 'odom', 'scan_matching', 'gtsam'
    (reference: main.py:18,116-192).
    """
    counts = jnp.asarray(counts)
    gyro = jnp.asarray(gyro)

    points, masks = scan_ops.scans_to_points(
        jnp.asarray(ranges), range_min, range_max, cfg.lidar)

    if filter_lidar:
        from ..ops import filters
        masks = filters.dbscan_filter_scans(
            points, masks, eps=cfg.filter.dbscan_eps,
            min_samples=cfg.filter.dbscan_min_samples)
        masks = filters.statistical_filter_scans(
            points, masks, k_std=cfg.filter.statistical_k_std)

    # gates for loop closures (reference: main.py:94-101)
    max_distance, max_yaw_deg = odometry.max_step_gates(counts, gyro,
                                                        cfg.robot.dt)

    poses_odom, rel_odom = odometry.poses_from_odometry(
        counts, gyro, dt=cfg.robot.dt, return_relative_poses=True)

    result = SlamResult(
        poses_odom=np.asarray(poses_odom),
        relative_poses_odom=np.asarray(rel_odom),
        poses=np.asarray(poses_odom),
    )
    final_poses = poses_odom

    if mode in ("scan_matching", "gtsam"):
        sm = scan_matching.poses_from_scan_matching(
            poses_odom, points, masks, cfg.icp, chunk_size=chunk_size)
        result.poses_scan_matching = np.asarray(sm.poses)
        result.relative_poses_scan_matching = np.asarray(sm.relative_poses)
        final_poses = sm.poses

    if mode == "gtsam":
        pts3 = icp_ops.lift_to_3d(points)
        cand = loop_closure_candidates(int(final_poses.shape[0]), fixed_interval)
        loop_T, accept, _, _ = compute_loop_closures(
            pts3, masks, cand, fixed_interval,
            float(max_distance), float(max_yaw_deg), chunk_size=chunk_size)
        result.n_loop_closures = int(np.asarray(accept).sum())

        # keep the banded solver's band in sync with the ACTUAL loop span:
        # the run_slam fixed_interval argument (CLI --fixed_interval)
        # overrides the config default, and band = cfg.fixed_interval in
        # optimize_with_config — a mismatch would silently drop loop
        # Hessian blocks that span more than `band` poses
        import dataclasses
        pg_cfg = dataclasses.replace(cfg.pose_graph,
                                     fixed_interval=fixed_interval)
        opt = pose_graph.optimize_trajectory(
            final_poses, sm.relative_poses, jnp.asarray(cand),
            jnp.asarray(cand + fixed_interval), loop_T, accept,
            pg_cfg)
        result.poses_optimized = np.asarray(opt.poses)
        final_poses = opt.poses

    result.poses = np.asarray(final_poses)

    if build_map:
        K = occupancy.adaptive_ray_cells(points, masks, cfg.map,
                                         float(range_max))
        logodds = occupancy.build_logodds(final_poses, points, masks,
                                          cfg.map, K)
        result.logodds = np.asarray(logodds)
        result.grid_map = np.asarray(occupancy.finalize_grid(logodds))

    return result
