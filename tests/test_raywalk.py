"""Tests for the Pallas ray-walk map kernel (ops/raywalk.py).

Off-TPU the kernel runs in interpreter mode; these tests pin exact
equality with the scatter path (models/occupancy.py) on adversarial
geometry, and validate the closed-form [k_in, k_out] descriptors against
the dense fixed-slot Bresenham trace they summarize.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_slam_tpu.config import MapConfig
from lidar_slam_tpu.models.occupancy import build_logodds, max_ray_cells
from lidar_slam_tpu.ops.bresenham import bresenham_fixed
from lidar_slam_tpu.ops.raywalk import build_logodds_raywalk, ray_descriptors

CFG = MapConfig(resolution=0.1, world_max_x=6, world_min_x=-6,
                world_max_y=6, world_min_y=-6)
K = max_ray_cells(CFG, 9.0)


def _adversarial_scans(seed=0, n=10, r=96):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(-np.pi, np.pi, (n, r))
    rad = rng.uniform(0.2, 9.0, (n, r))  # many endpoints exit the map
    pts = np.stack([rad * np.cos(ang), rad * np.sin(ang)],
                   axis=-1).astype(np.float32)
    masks = rng.random((n, r)) > 0.1
    pts[0, :4] = 0.001                   # zero-length rays
    pts[1, 4] = [3.0, 0.0]               # axis-aligned rays
    pts[1, 5] = [0.0, -4.5]
    pts[1, 6] = [-2.0, 0.0]
    masks[2, :] = False                  # fully masked scan
    poses = np.cumsum(rng.normal(0, 0.15, (n, 3)), axis=0).astype(np.float32)
    poses[:, 2] = rng.uniform(-np.pi, np.pi, n)
    return (jnp.asarray(poses), jnp.asarray(pts), jnp.asarray(masks))


def test_raywalk_matches_scatter_exactly():
    poses, pts, masks = _adversarial_scans()
    g_sc = np.asarray(build_logodds(poses, pts, masks, CFG, K,
                                    backend="scatter"))
    g_rw = np.asarray(build_logodds_raywalk(poses, pts, masks, CFG, K,
                                            interpret=True))
    assert g_sc.shape == g_rw.shape == (CFG.width, CFG.height)
    np.testing.assert_array_equal(g_sc, g_rw)
    assert (g_sc != 0).sum() > 1000  # the case actually exercises the map


def test_backend_dispatch_raywalk():
    poses, pts, masks = _adversarial_scans(seed=3, n=4, r=48)
    g_auto = np.asarray(build_logodds(poses, pts, masks, CFG, K))
    g_rw = np.asarray(build_logodds(poses, pts, masks, CFG, K,
                                    backend="raywalk"))
    g_sc = np.asarray(build_logodds(poses, pts, masks, CFG, K,
                                    backend="scatter"))
    np.testing.assert_array_equal(g_rw, g_sc)
    # off-TPU, auto == scatter
    np.testing.assert_array_equal(g_auto, g_sc)


def test_raywalk_init_grid():
    poses, pts, masks = _adversarial_scans(seed=5, n=3, r=32)
    init = jnp.full((CFG.width, CFG.height), 2.5, jnp.float32)
    g_sc = np.asarray(build_logodds(poses, pts, masks, CFG, K, init=init,
                                    backend="scatter"))
    g_rw = np.asarray(build_logodds_raywalk(poses, pts, masks, CFG, K,
                                            init=init, interpret=True))
    np.testing.assert_array_equal(g_sc, g_rw)


@pytest.mark.parametrize("seed", [0, 1])
def test_descriptors_match_dense_trace(seed):
    """[k_in, k_out] must equal the in-bounds slot interval of the dense
    fixed-slot trace (ops/bresenham.py) used by the scatter path."""
    rng = np.random.default_rng(seed)
    r = 256
    ang = rng.uniform(-np.pi, np.pi, r)
    rad = rng.uniform(0.05, 9.0, r)
    pts = np.stack([rad * np.cos(ang), rad * np.sin(ang)],
                   axis=-1).astype(np.float32)
    pose = jnp.asarray(rng.normal(0, 1.0, 3).astype(np.float32))
    mask = jnp.ones(r, bool)

    desc = ray_descriptors(pose, jnp.asarray(pts), mask, CFG, K)
    steep, sM, sm, sgM, sgm, dM, dm, c, k_in, k_out = map(np.asarray, desc)

    # dense trace, same endpoint math as occupancy.scan_logodds_cells
    from lidar_slam_tpu.config import LidarConfig
    from lidar_slam_tpu.models.occupancy import world2grid
    x, y, yaw = [float(v) for v in np.asarray(pose)]
    cth, sth = np.cos(yaw), np.sin(yaw)
    wx = pts[:, 0] * cth - pts[:, 1] * sth + x
    wy = pts[:, 0] * sth + pts[:, 1] * cth + y
    ox = x + LidarConfig().p_rl[0]
    oy = y + LidarConfig().p_rl[1]
    sx, sy = world2grid(jnp.asarray(ox), jnp.asarray(oy), CFG)
    ex, ey = world2grid(jnp.asarray(wx), jnp.asarray(wy), CFG)
    xs, ys, in_ray = bresenham_fixed(
        jnp.broadcast_to(sx, ex.shape), jnp.broadcast_to(sy, ey.shape),
        ex, ey, K)
    in_b = (np.asarray(xs) >= 0) & (np.asarray(xs) < CFG.width) & \
           (np.asarray(ys) >= 0) & (np.asarray(ys) < CFG.height) & \
           np.asarray(in_ray)

    kk = np.arange(K)
    for i in range(r):
        valid_ks = kk[in_b[i]]
        if valid_ks.size == 0:
            assert k_in[i] > k_out[i], f"ray {i} should be skipped"
            continue
        # in-bounds slots of a ray through a convex map are contiguous
        assert valid_ks[-1] - valid_ks[0] + 1 == valid_ks.size, f"ray {i}"
        assert k_in[i] == valid_ks[0], f"ray {i}"
        assert k_out[i] == valid_ks[-1], f"ray {i}"


def test_raywalk_v1_matches_v2():
    """v2's precomputed visit descriptors must reproduce v1's in-kernel
    boundary walk exactly (same visits, same cells, same accumulation
    order)."""
    poses, pts, masks = _adversarial_scans(seed=7, n=8, r=96)
    g1 = np.asarray(build_logodds_raywalk(poses, pts, masks, CFG, K,
                                          interpret=True, version=1))
    g2 = np.asarray(build_logodds_raywalk(poses, pts, masks, CFG, K,
                                          interpret=True, version=2))
    np.testing.assert_array_equal(g1, g2)
    assert (g2 != 0).sum() > 500


def test_raywalk_v3_matches_v2():
    """v3's affine on-ray test (no per-visit division) must reproduce v2
    exactly — same visits, same cells, same accumulation order — including
    the degenerate empty visits (k1 == k0 from coincident boundary
    crossings) that a naive min/max span would mis-handle."""
    poses, pts, masks = _adversarial_scans(seed=7, n=8, r=96)
    g2 = np.asarray(build_logodds_raywalk(poses, pts, masks, CFG, K,
                                          interpret=True, version=2))
    g3 = np.asarray(build_logodds_raywalk(poses, pts, masks, CFG, K,
                                          interpret=True, version=3))
    np.testing.assert_array_equal(g2, g3)
    assert (g3 != 0).sum() > 500

    # dataset-shaped config (the empty-visit repro regime: deep slot
    # counts produce coincident major/minor crossings)
    cfg = MapConfig(resolution=0.05, world_max_x=30, world_min_x=-30,
                    world_max_y=30, world_min_y=-30)
    k = max_ray_cells(cfg, 30.0)
    rng = np.random.default_rng(1)
    n, r = 4, 256
    ang = rng.uniform(-np.pi, np.pi, (n, r))
    rad = rng.uniform(0.3, 29.5, (n, r))
    pts = jnp.asarray(np.stack([rad * np.cos(ang), rad * np.sin(ang)],
                               axis=-1), jnp.float32)
    masks = jnp.asarray(rng.random((n, r)) > 0.1)
    poses = jnp.asarray(np.cumsum(rng.normal(0, 0.1, (n, 3)), 0),
                        jnp.float32)
    g_sc = np.asarray(build_logodds(poses, pts, masks, cfg, k,
                                    backend="scatter"))
    g3 = np.asarray(build_logodds_raywalk(poses, pts, masks, cfg, k,
                                          interpret=True, version=3))
    np.testing.assert_array_equal(g_sc, g3)
    # the signed-compare A/B variant must agree too
    g4 = np.asarray(build_logodds_raywalk(poses, pts, masks, cfg, k,
                                          interpret=True, version=4))
    np.testing.assert_array_equal(g3, g4)
    # v7 (precomputed per-visit scalars, the production default) too
    g7 = np.asarray(build_logodds_raywalk(poses, pts, masks, cfg, k,
                                          interpret=True, version=7))
    np.testing.assert_array_equal(g3, g7)
    # v8 (paired visits with even-padded descriptors) too — this config's
    # deep slot counts exercise odd/even visit counts and empty visits
    g8 = np.asarray(build_logodds_raywalk(poses, pts, masks, cfg, k,
                                          interpret=True, version=8))
    np.testing.assert_array_equal(g3, g8)
    # v11 (fused multi-scan: one pallas_call, grid over scans, VMEM-resident
    # map, per-step SMEM descriptor blocks) too
    g11 = np.asarray(build_logodds_raywalk(poses, pts, masks, cfg, k,
                                           interpret=True, version=11))
    np.testing.assert_array_equal(g3, g11)


def test_raywalk_fuzz_random_configs():
    """Seeded fuzz over random map geometries and ray patterns: every
    kernel version must reproduce the scatter path EXACTLY. This is the
    class of test that caught the v3 empty-visit bug (coincident boundary
    crossings at dataset-like slot depths)."""
    rng = np.random.default_rng(123)
    for trial in range(10):
        res = float(rng.choice([0.05, 0.08, 0.1, 0.13, 0.2, 0.25]))
        ext_x = float(rng.uniform(2.0, 12.0))
        ext_y = float(rng.uniform(2.0, 12.0))
        cfg = MapConfig(resolution=res,
                        world_max_x=ext_x, world_min_x=-ext_x,
                        world_max_y=ext_y, world_min_y=-ext_y)
        rmax = float(rng.uniform(0.5, 1.6)) * max(ext_x, ext_y)
        K = max_ray_cells(cfg, rmax)
        n, r = int(rng.integers(2, 5)), int(rng.integers(16, 64))
        ang = rng.uniform(-np.pi, np.pi, (n, r))
        rad = rng.uniform(0.05, rmax, (n, r))
        pts = np.stack([rad * np.cos(ang), rad * np.sin(ang)],
                       axis=-1).astype(np.float32)
        # adversarial specials: axis-aligned, 45-degree (dm == dM ties),
        # zero-length
        pts[0, 0] = [rad[0, 0], 0.0]
        pts[0, 1] = [0.0, -rad[0, 1]]
        pts[0, 2] = [rad[0, 2], rad[0, 2]]
        pts[0, 3] = [1e-4, 1e-4]
        masks = rng.random((n, r)) > 0.1
        poses = np.cumsum(rng.normal(0, 0.3, (n, 3)), axis=0).astype(
            np.float32)
        # sometimes start outside the map entirely
        if trial % 3 == 0:
            poses[:, 0] += ext_x * 1.2
        want = np.asarray(build_logodds(
            jnp.asarray(poses), jnp.asarray(pts), jnp.asarray(masks),
            cfg, K, backend="scatter"))
        for version in (1, 2, 3, 7, 8, 11):
            got = np.asarray(build_logodds_raywalk(
                jnp.asarray(poses), jnp.asarray(pts), jnp.asarray(masks),
                cfg, K, interpret=True, version=version))
            np.testing.assert_array_equal(
                got, want, err_msg=f"trial {trial} version {version} "
                f"(res={res}, ext=({ext_x:.2f},{ext_y:.2f}), K={K})")


def test_large_k_falls_back_and_stays_exact():
    """K beyond the v2 visit-crossing capacity (_NCROSS * TS) must fall
    back to v1 and still produce the exact map — the round-2 review found
    K in (~704, 1023] silently dropped cells past the 11th tile crossing
    (long rays at fine resolution, e.g. main.py --res 0.04)."""
    from lidar_slam_tpu.config import MapConfig
    from lidar_slam_tpu.models.occupancy import build_logodds
    from lidar_slam_tpu.ops.raywalk import _NCROSS, TS

    cfg = MapConfig(resolution=0.025, world_max_x=10, world_min_x=-10,
                    world_max_y=10, world_min_y=-10)
    K = 768
    assert K > _NCROSS * TS  # the regression regime
    rng = np.random.default_rng(3)
    n, r = 4, 64
    ang = rng.uniform(-np.pi, np.pi, (n, r))
    dist = rng.uniform(1.0, 19.0, (n, r))
    pts = jnp.asarray(np.stack([dist * np.cos(ang), dist * np.sin(ang)],
                               axis=-1), jnp.float32)
    masks = jnp.ones((n, r), bool)
    poses = jnp.asarray(rng.normal(0, 0.5, (n, 3)), jnp.float32)

    got = np.asarray(build_logodds_raywalk(poses, pts, masks, cfg, K,
                                           interpret=True, version=2))
    want = np.asarray(build_logodds(poses, pts, masks, cfg, K,
                                    backend="scatter"))
    np.testing.assert_array_equal(got, want)
    assert (got != 0).sum() > 1000


def test_v11_init_falls_back_to_per_scan_path():
    """The fused kernel zero-initializes its VMEM-resident grid, so
    version=11 with an init grid must route to the per-scan v8 path and
    still produce the exact incremental result."""
    poses, pts, masks = _adversarial_scans(seed=11, n=6, r=96)
    init = jnp.asarray(
        np.random.default_rng(5).normal(0, 1, (CFG.width, CFG.height)),
        jnp.float32)
    want = np.asarray(build_logodds_raywalk(poses, pts, masks, CFG, K,
                                            init=init, interpret=True,
                                            version=8))
    got = np.asarray(build_logodds_raywalk(poses, pts, masks, CFG, K,
                                           init=init, interpret=True,
                                           version=11))
    np.testing.assert_array_equal(got, want)


def test_v11_large_k_falls_back_and_stays_exact():
    """K beyond the shared v2 visit-crossing capacity must drop v11 to v1,
    exactly like v8 (the fused path reuses the v8 word format and inherits
    its capacity limits)."""
    cfg = MapConfig(resolution=0.025, world_max_x=10, world_min_x=-10,
                    world_max_y=10, world_min_y=-10)
    k = 768
    rng = np.random.default_rng(9)
    n, r = 3, 48
    ang = rng.uniform(-np.pi, np.pi, (n, r))
    dist = rng.uniform(1.0, 19.0, (n, r))
    pts = jnp.asarray(np.stack([dist * np.cos(ang), dist * np.sin(ang)],
                               axis=-1), jnp.float32)
    masks = jnp.ones((n, r), bool)
    poses = jnp.asarray(rng.normal(0, 0.5, (n, 3)), jnp.float32)
    want = np.asarray(build_logodds(poses, pts, masks, cfg, k,
                                    backend="scatter"))
    got = np.asarray(build_logodds_raywalk(poses, pts, masks, cfg, k,
                                           interpret=True, version=11))
    np.testing.assert_array_equal(got, want)


def test_unknown_version_raises():
    # mislabeled A/B timings are worse than a crash: unknown versions must
    # error, not silently fall back to some other kernel
    poses, pts, masks = _adversarial_scans(n=3)
    for bad in (0, 5, 6, 9, 42):
        with pytest.raises(ValueError, match="unknown raywalk kernel"):
            build_logodds_raywalk(poses, pts, masks, CFG, K,
                                  interpret=True, version=bad)
