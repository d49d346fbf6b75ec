import os

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_slam_tpu.ops import correlation, voxel
from lidar_slam_tpu.models import warmup

REF = "/root/reference"


def _np_map_correlation(im, x_im, y_im, vp, xs, ys):
    """Independent numpy spec model (spec: code/pr2_utils.py:12-43)."""
    nx, ny = im.shape
    xres = (x_im[-1] - x_im[0]) / (nx - 1)
    yres = (y_im[-1] - y_im[0]) / (ny - 1)
    cpr = np.zeros((xs.size, ys.size))
    for jy in range(ys.size):
        iy = np.int16(np.round((vp[1] + ys[jy] - y_im[0]) / yres))
        for jx in range(xs.size):
            ix = np.int16(np.round((vp[0] + xs[jx] - x_im[0]) / xres))
            ok = (iy >= 0) & (iy < ny) & (ix >= 0) & (ix < nx)
            cpr[jx, jy] = np.sum(im[ix[ok], iy[ok]])
    return cpr


def test_map_correlation_matches_spec():
    rng = np.random.default_rng(0)
    nx = ny = 101
    im = (rng.random((nx, ny)) > 0.7).astype(np.int8)
    x_im = np.linspace(-2.5, 2.5, nx)
    y_im = np.linspace(-2.5, 2.5, ny)
    vp = rng.uniform(-3, 3, (2, 200))
    xs = np.arange(-0.2, 0.2 + 0.05, 0.05)
    ys = np.arange(-0.2, 0.2 + 0.05, 0.05)

    got = np.asarray(correlation.map_correlation(
        jnp.asarray(im), jnp.asarray(x_im), jnp.asarray(y_im),
        jnp.asarray(vp), jnp.asarray(xs), jnp.asarray(ys)))
    want = _np_map_correlation(im, x_im, y_im, vp, xs, ys)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_map_correlation_golden_fixture():
    """Conformance against the reference's committed fixture + hardcoded
    expected 9x9 matrix (reference: code/pr2_utils.py:109-172)."""
    fixture = os.path.join(REF, "code", "test_ranges.npy")
    if not os.path.exists(fixture):
        pytest.skip("reference fixture unavailable")
    ranges = np.load(fixture)
    angles = np.arange(-135, 135.25, 0.25) * np.pi / 180.0
    ok = (ranges < 30) & (ranges > 0.1)
    r, a = ranges[ok], angles[ok]

    res = 0.05
    sizex = sizey = int(np.ceil((20 - (-20)) / res + 1))
    xs0, ys0 = r * np.cos(a), r * np.sin(a)
    xis = np.ceil((xs0 - (-20)) / res).astype(np.int16) - 1
    yis = np.ceil((ys0 - (-20)) / res).astype(np.int16) - 1
    MAP = np.zeros((sizex, sizey), np.int8)
    # reference's own (buggy but canonical) map construction: indGood is
    # indexed with its first element (pr2_utils.py:143-144)
    indGood = (xis > 1) & (yis > 1) & (xis < sizex) & (yis < sizey)
    MAP[xis[indGood[0]], yis[indGood[0]]] = 1

    x_im = np.arange(-20, 20 + res, res)
    y_im = np.arange(-20, 20 + res, res)
    off = np.arange(-0.2, 0.2 + 0.05, 0.05)
    got = np.asarray(correlation.map_correlation(
        jnp.asarray(MAP), jnp.asarray(x_im), jnp.asarray(y_im),
        jnp.asarray(np.stack([xs0, ys0])), jnp.asarray(off), jnp.asarray(off)))

    c_ex = np.array([
        [3, 4, 8, 162, 270, 132, 18, 1, 0],
        [25, 1, 8, 201, 307, 109, 5, 1, 3],
        [314, 198, 91, 263, 366, 73, 5, 6, 6],
        [130, 267, 360, 660, 606, 87, 17, 15, 9],
        [17, 28, 95, 618, 668, 370, 271, 136, 30],
        [9, 10, 64, 404, 229, 90, 205, 308, 323],
        [5, 16, 101, 360, 152, 5, 1, 24, 102],
        [7, 30, 131, 309, 105, 8, 4, 4, 2],
        [16, 55, 138, 274, 75, 11, 6, 6, 3],
    ])
    np.testing.assert_array_equal(got.astype(np.int64), c_ex)


def _np_voxel_reference(pc, voxel_size):
    vox = np.floor((pc - pc.min(0)) / voxel_size).astype(int)
    uniq, inv = np.unique(vox, axis=0, return_inverse=True)
    return np.stack([pc[inv == i].mean(0) for i in range(len(uniq))])


def test_voxel_downsample_matches_reference_spec():
    rng = np.random.default_rng(1)
    pc = rng.normal(0, 1.0, (500, 3))
    got = voxel.voxel_downsample(pc, 0.5)
    want = _np_voxel_reference(pc, 0.5)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_voxel_downsample_masked_matches_host():
    rng = np.random.default_rng(2)
    pc = rng.normal(0, 1.0, (400, 3))
    mask = rng.random(400) > 0.3
    got, valid = voxel.voxel_downsample_masked(
        jnp.asarray(pc), jnp.asarray(mask), 0.5, max_voxels=256)
    want = voxel.voxel_downsample(pc[mask], 0.5)
    got_np = np.asarray(got)[np.asarray(valid)]
    # same voxel set (order may differ between linear-id and lex sort)
    assert len(got_np) == len(want)
    gs = got_np[np.lexsort(got_np.T)]
    ws = want[np.lexsort(want.T)]
    np.testing.assert_allclose(gs, ws, atol=1e-9)


def test_warmup_recovers_large_yaw():
    """A cloud rotated 150 degrees: single-seed ICP fails, the 24-seed sweep
    recovers it (the point of the warm-up harness)."""
    rng = np.random.default_rng(3)
    src = rng.normal(0, 0.1, (400, 3)) * np.array([1.0, 0.6, 0.3])
    yaw = np.radians(150.0)
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    tgt = src @ R.T + np.array([0.3, -0.2, 0.1]) + rng.normal(0, 0.002, src.shape)

    best_T, best_err, errs = warmup.best_icp_alignment(src, tgt, n_seeds=24,
                                                       seed_batch=12)
    np.testing.assert_allclose(best_T[:3, :3], R, atol=0.05)
    assert best_err < 0.002
    assert errs.shape == (24,)
    # and plenty of seeds should NOT have found the optimum
    assert (errs > best_err * 10).sum() > 5


def test_warmup_downsample_trigger():
    rng = np.random.default_rng(4)
    src = rng.normal(0, 0.1, (25000, 3))
    tgt = src + np.array([0.05, 0.0, 0.0])
    best_T, best_err, _ = warmup.best_icp_alignment(
        src, tgt, n_seeds=2, downsample_above=20000, voxel_size=0.05,
        seed_batch=2)
    assert np.isfinite(best_err)
    np.testing.assert_allclose(best_T[:3, 3], [0.05, 0, 0], atol=0.02)


def test_chunked_nn_matches_plain():
    import jax.numpy as jnp
    from lidar_slam_tpu.ops.nn import nearest_neighbors, nearest_neighbors_chunked
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.normal(size=(2, 500, 3)))
    tgt = jnp.asarray(rng.normal(size=(2, 300, 3)))
    mask = jnp.asarray(rng.random((2, 300)) > 0.3)
    got = nearest_neighbors_chunked(src, tgt, mask, src_chunk=128)
    want = nearest_neighbors(src, tgt, mask)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_warmup_large_cloud_memory_guard(monkeypatch):
    """Large clouds must shrink the seed batch / use chunked NN instead of
    materializing a (B, N, M) distance tensor."""
    rng = np.random.default_rng(6)
    src = rng.normal(0, 0.1, (3000, 3))
    tgt = src @ np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]]).T + 0.1
    # pretend the memory budget is tiny so the guard must engage
    import lidar_slam_tpu.models.warmup as w
    T, err, errs = w.best_icp_alignment(src, tgt, n_seeds=4, seed_batch=4,
                                        downsample_above=10**9)
    assert np.isfinite(err)


def test_export_ply_roundtrip(tmp_path):
    """PLY export (the Open3D-visualization analog, reference
    code/icp_warm_up/utils.py:33-50) writes a parseable file whose
    vertices round-trip the input clouds."""
    from lidar_slam_tpu.models.warmup import export_ply

    rng = np.random.default_rng(0)
    a = rng.normal(size=(7, 3))
    b = rng.normal(size=(4, 3))
    p = tmp_path / "out.ply"
    export_ply(str(p), [a, b])
    lines = p.read_text().splitlines()
    n_hdr = lines.index("end_header") + 1
    assert "element vertex 11" in "\n".join(lines[:n_hdr])
    pts = np.array([[float(v) for v in ln.split()[:3]]
                    for ln in lines[n_hdr:]])
    np.testing.assert_allclose(pts, np.concatenate([a, b]), atol=1e-5)


def test_warmup_synthetic_clouds_align():
    # the --synthetic CLI path: targets are rigid transforms of the model,
    # so the seeded sweep must drive the normalized error to ~0
    from lidar_slam_tpu.models import warmup

    model = warmup.synthetic_model(n_points=600, seed=3)
    target = warmup.synthetic_pc(model, idx=0, seed=3)
    _, best_err, _ = warmup.best_icp_alignment(model, target, n_seeds=6)
    assert best_err < 1e-3


def test_view_interactive_falls_back_without_open3d():
    """view_interactive (the reference's o3d window analog,
    code/icp_warm_up/utils.py:33-50) must return False — never raise —
    when open3d is absent (this image) so callers route to export_ply."""
    from lidar_slam_tpu.models import warmup

    clouds = [np.zeros((4, 3), np.float32), np.ones((4, 3), np.float32)]
    assert warmup.view_interactive(clouds) in (False,)  # no open3d here
