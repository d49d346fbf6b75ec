"""RGB-D floor texture mapping.

Capability parity with the reference texture stage
(reference: modules/texture_mapping.py:7-240, driver main.py:213-247),
redesigned TPU-first. The reference loops over RGB frames on the host,
decoding two PNGs and chaining five frame transforms per iteration; here

  - PNG decode is the native C++ batch loader (libpng + thread pool,
    native/slamio.cpp) feeding pinned host arrays;
  - the whole unproject chain (disparity -> depth -> K^-1 ray -> optical ->
    camera -> robot -> world) is one fused jitted function over a BATCH of
    frames;
  - painting is a global scatter-max of point sequence numbers: the
    reference's per-frame in-place fancy assignment keeps the LAST write per
    cell (later frames and later points win, texture_mapping.py:96); a
    scatter-max of global point indices reproduces that winner exactly with
    no sequential loop, and each batch immediately folds its winning
    points' colors into a per-CELL color array — state stays O(cells)
    (~12 MB) instead of O(all points) (~3 GB at dataset-20 scale).

Replicated reference quirks:
  - get_rgbi_rgbj is called with DEPTH, not the disparity-derived dd
    (texture_mapping.py:198 passes depth_flat into the dd slot) — faithful;
  - no z filter on "floor" points (texture_mapping.py:83-84);
  - the texture base is the 0/1 occupancy grid_map replicated to 3 channels
    and divided by 255 at the end, so the background is near-black.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraConfig, MapConfig
from ..utils.precision import einsum as p_einsum
from . import occupancy


def camera_matrices(cfg: CameraConfig):
    """K, T_rc (camera->robot), R_oc (optical<-camera) as numpy
    (reference: main.py:217-232, modules/texture_mapping.py:212-217)."""
    K = np.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1.0]])
    pitch = np.radians(cfg.pitch_deg)
    R_rc = np.array([
        [np.cos(pitch), 0, np.sin(pitch)],
        [0, 1, 0],
        [-np.sin(pitch), 0, np.cos(pitch)],
    ])
    T_rc = np.eye(4)
    T_rc[:3, :3] = R_rc
    T_rc[:3, 3] = cfg.p_rc
    R_oc = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    return K, T_rc, R_oc


def get_depth_image(disparity: jnp.ndarray, cfg: CameraConfig = CameraConfig()):
    """Disparity -> depth (reference: modules/texture_mapping.py:134-145)."""
    dd = cfg.disp_a * disparity + cfg.disp_b
    return cfg.depth_scale / dd


def get_rgbi_rgbj(i, j, dd, cfg: CameraConfig = CameraConfig()):
    """Depth-registered RGB pixel coordinates
    (reference: modules/texture_mapping.py:147-163)."""
    rgbi = (cfg.reg_scale * i + cfg.reg_i_off - cfg.reg_dd * dd) / cfg.reg_div
    rgbj = (cfg.reg_scale * j + cfg.reg_j_off) / cfg.reg_div
    return rgbi, rgbj


@partial(jax.jit, static_argnames=("map_cfg", "cam_cfg"))
def frames_to_cells(
    disparity: jnp.ndarray,  # (B, H, W) float32 or uint16 (raw sensor)
    rgb: jnp.ndarray,  # (B, H, W, 3) uint8
    poses: jnp.ndarray,  # (B, 3) robot pose per frame
    map_cfg: MapConfig,
    cam_cfg: CameraConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused unproject chain for a batch of frames.

    Returns flat (B*H*W,) cell linear indices (or -1 when invalid), colors
    (B*H*W,) int32 with the three uint8 channels packed r | g<<8 | b<<16,
    in point order (frame-major) so index order equals the reference's
    write order. Colors stay packed (and on device) until the final
    compose: uint8 gathers lower pathologically on TPU (measured 85 s vs
    2.6 s for one int32 gather at 8 x 480 x 640).

    Integer disparity (the sensor's native uint16) converts to f32 ON
    DEVICE — the host uploads half the bytes, and the tunnel upload is the
    stage's dominant cost (uint16 values < 2^24, so the cast is exact and
    the result equals the host-float path bit-for-bit).
    """
    if not jnp.issubdtype(disparity.dtype, jnp.floating):
        disparity = disparity.astype(jnp.float32)
    K, T_rc, R_oc = camera_matrices(cam_cfg)
    Kinv = jnp.asarray(np.linalg.inv(K), disparity.dtype)
    # camera <- optical is inv(T_oc) where T_oc rotates by R_oc
    R_co = jnp.asarray(R_oc.T, disparity.dtype)
    T_rc = jnp.asarray(T_rc, disparity.dtype)

    B, H, W = disparity.shape
    depth = get_depth_image(disparity, cam_cfg)  # (B, H, W)

    ii = jnp.arange(H, dtype=disparity.dtype)[:, None]  # (H, 1)
    jj = jnp.arange(W, dtype=disparity.dtype)[None, :]  # (1, W)
    ii = jnp.broadcast_to(ii, (H, W))
    jj = jnp.broadcast_to(jj, (H, W))

    # pixel -> optical-frame ray * depth (note the reference uses (j, i, 1),
    # texture_mapping.py:194)
    pix = jnp.stack([jj, ii, jnp.ones_like(ii)], axis=-1)  # (H, W, 3)
    rays = p_einsum("de,hwe->hwd", Kinv, pix)  # (H, W, 3)
    xyz_o = rays[None] * depth[..., None]  # (B, H, W, 3)

    # RGB registration (reference passes depth into the dd slot, :198)
    rgbi, rgbj = get_rgbi_rgbj(ii[None], jj[None], depth, cam_cfg)
    valid = (rgbi >= 0) & (rgbi < H) & (rgbj >= 0) & (rgbj < W)
    ri = jnp.clip(rgbi.astype(jnp.int32), 0, H - 1)
    rj = jnp.clip(rgbj.astype(jnp.int32), 0, W - 1)
    rgb_flat = rgb.reshape(B, H * W, 3).astype(jnp.int32)
    packed = (rgb_flat[..., 0] | (rgb_flat[..., 1] << 8)
              | (rgb_flat[..., 2] << 16))  # (B, H*W) int32
    colors = jnp.take_along_axis(
        packed, (ri * W + rj).reshape(B, H * W), axis=1)

    # optical -> camera -> robot
    xyz_c = p_einsum("de,bhwe->bhwd", R_co, xyz_o)
    xyz_r = p_einsum("de,bhwe->bhwd", T_rc[:3, :3], xyz_c) + T_rc[:3, 3]

    # robot -> world by pose yaw (reference: texture_mapping.py:70-81)
    yaw = poses[:, 2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    xw = c[:, None, None] * xyz_r[..., 0] - s[:, None, None] * xyz_r[..., 1] \
        + poses[:, 0][:, None, None]
    yw = s[:, None, None] * xyz_r[..., 0] + c[:, None, None] * xyz_r[..., 1] \
        + poses[:, 1][:, None, None]

    gi, gj = occupancy.world2grid(xw, yw, map_cfg)
    in_map = (gi >= 0) & (gi < map_cfg.width) & (gj >= 0) & (gj < map_cfg.height)
    ok = valid & in_map
    lin = jnp.where(ok, gi * map_cfg.height + gj, -1)
    return lin.reshape(-1), colors.reshape(-1), ok.reshape(-1)


@partial(jax.jit, static_argnames=("B", "H", "W", "map_cfg", "cam_cfg"))
def frames_to_cells_packed(
    buf: jnp.ndarray,  # (B*H*W*5 + B*12,) uint8 — one upload per batch
    B: int, H: int, W: int,
    map_cfg: MapConfig,
    cam_cfg: CameraConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """frames_to_cells over a SINGLE packed byte buffer.

    The tunnel charges ~26 ms of latency PER TRANSFER regardless of size
    (tools/upload_bench.py), so the three per-batch uploads (disparity,
    rgb, poses) are packed host-side into one uint8 buffer and split on
    device: [uint16 disparity | uint8 rgb | f32 poses] in row-major byte
    order. bitcast_convert_type consumes the trailing byte axis with the
    host's little-endian layout, so the unpacked arrays are bit-identical
    to uploading the originals (tests/test_texture.py packed-path test).
    """
    n_d = B * H * W * 2
    n_r = B * H * W * 3
    disp = jax.lax.bitcast_convert_type(
        buf[:n_d].reshape(B, H, W, 2), jnp.uint16)
    rgb = buf[n_d:n_d + n_r].reshape(B, H, W, 3)
    poses = jax.lax.bitcast_convert_type(
        buf[n_d + n_r:n_d + n_r + B * 12].reshape(B, 3, 4), jnp.float32)
    return frames_to_cells(disp, rgb, poses, map_cfg, cam_cfg)


def pack_frame_batch(disp: np.ndarray, rgb: np.ndarray,
                     poses: np.ndarray) -> np.ndarray:
    """Host-side packing for frames_to_cells_packed: one contiguous uint8
    buffer per batch (a ~25 MB memcpy at batch 16 — done in the prefetch
    thread, overlapped with device compute)."""
    return np.concatenate([
        np.ascontiguousarray(disp, np.uint16).view(np.uint8).ravel(),
        np.ascontiguousarray(rgb, np.uint8).ravel(),
        np.ascontiguousarray(poses, np.float32).view(np.uint8).ravel()])


def _paint_cells_impl(winner: jnp.ndarray, cell_color: jnp.ndarray,
                      lin: jnp.ndarray, colors: jnp.ndarray,
                      base_index) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter-max global point sequence numbers into the cell-winner map
    and fold this batch's winning colors into the per-cell color array.

    Invalid points carry value -1, which never beats a real winner (int32
    sequence numbers cover ~7000 frames of 480x640 points). A cell whose
    winner strictly increased was won by THIS batch (all its sequence
    numbers exceed every earlier batch's), so its color comes from this
    batch's packed colors; others keep their current color — exactly the
    reference's last-writer-wins (texture_mapping.py:96)."""
    seq = base_index + jnp.arange(lin.shape[0], dtype=jnp.int32)
    upd = jnp.where(lin >= 0, seq, -1)
    safe = jnp.where(lin >= 0, lin, 0)
    winner_new = winner.at[safe].max(upd)
    won_here = winner_new > winner
    local = jnp.clip(winner_new - base_index, 0, colors.shape[0] - 1)
    cell_color = jnp.where(won_here, jnp.take(colors, local), cell_color)
    return winner_new, cell_color


paint_cells = partial(jax.jit, donate_argnums=(0, 1))(_paint_cells_impl)


def _pad_paint_ops(cells: np.ndarray, colors: np.ndarray,
                   min_pad: int = 4096, multiple_of: int = 1) -> np.ndarray:
    """Pack variable-count paint ops into a (2, PAD) int32 buffer, PAD the
    next power of two (so the jitted paint sees a handful of static shapes
    across a whole run instead of one compile per batch). Padding rows
    carry cell = -1, which the scatter-max ignores. multiple_of rounds PAD
    up further (sharded_paint_ops splits the op axis across a mesh axis
    and needs PAD % n_devices == 0; a power of two covers power-of-two
    meshes only — advisor r4)."""
    m = len(cells)
    pad = max(min_pad, 1 << (m - 1).bit_length()) if m else min_pad
    pad = -(-pad // multiple_of) * multiple_of
    out = np.full((2, pad), -1, np.int32)
    out[0, :m] = cells
    out[1, :m] = colors
    return out


@partial(jax.jit, donate_argnums=(0, 1))
def paint_ops(winner: jnp.ndarray, cell_color: jnp.ndarray,
              ops: jnp.ndarray, base_index) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """paint_cells over a (2, PAD) packed paint-op buffer (row 0 cells,
    row 1 colors; padding cells are -1) — the device half of the native
    host-projector path."""
    return _paint_cells_impl(winner, cell_color, ops[0], ops[1], base_index)


def generate_texture_map(
    poses: np.ndarray,
    rgb_pose_indices: np.ndarray,
    disp_for_rgb: np.ndarray,
    grid_map: np.ndarray,
    load_frame_batch: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]],
    map_cfg: MapConfig = MapConfig(),
    cam_cfg: CameraConfig = CameraConfig(),
    batch_size: int = 16,
    dtype=jnp.float32,
    projector: str = "device",
    ops_group: int = 8,
) -> np.ndarray:
    """Build the texture map.

    poses (N, 3); rgb_pose_indices (F,) pose index per RGB frame;
    disp_for_rgb (F,) disparity frame index per RGB frame;
    load_frame_batch(frame_ids) -> (disparity (b, H, W) float32,
    rgb (b, H, W, 3) uint8) host loader (disk via native decoder, or
    synthetic injection in tests).

    Returns (W, H, 3) float32 texture (reference: texture_mapping.py:98).

    The batch loop is DOUBLE-BUFFERED: a background thread decodes and
    uploads batch s+1 (jax.device_put is async) while the device computes
    batch s — on the tunneled device the host->device upload is the
    stage's dominant cost (the link moves ~45 MB/s with ~26 ms latency
    per transfer and does NOT aggregate concurrent streams,
    tools/upload_bench.py), so the production path packs each batch's
    uint16 disparity + uint8 rgb + f32 poses into ONE byte buffer per
    batch (pack_frame_batch / frames_to_cells_packed): minimum bytes
    (5 B/pixel) at one transfer-latency per batch. The float-disparity
    path (f64 oracle validation) keeps separate uploads.

    projector selects where the unproject chain runs:
      - "device" (default): raw sensor bytes upload, chain on the TPU —
        the bit-parity oracle engine; on an attached host its upload cost
        vanishes into PCIe.
      - "native": the C++ host projector (native.project_frames) reduces
        each frame to its last-writer-wins (cell, color) paint ops and
        uploads ONLY those (~100x fewer bytes) — the thin-link engine: on
        the tunneled device it turns the stage from upload-bound into
        host-compute-bound. Requires integer disparity + the native lib.
      - "auto": "native" when available and the loader yields integer
        disparity, else "device".
    ops_group (native engine only): number of projected batches whose
    paint ops fold into ONE padded upload + ONE paint dispatch — the
    tunnel charges ~26 ms latency per transfer, which at batch 16
    ungrouped is ~1.6 ms/frame; at the default group of 8 (128 frames,
    still only ~400 KB) it amortizes to ~0.2 ms/frame.

    Both engines feed the SAME device-side scatter-max fold (paint_cells),
    and agree exactly on the committed test scenes (tests/test_texture.py
    cross-engine equality); they may differ on measure-zero cell-boundary
    pixels (f32 device chain vs the reference's f64 host dtype flow).
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..utils import native as native_mod

    W, Hn = map_cfg.width, map_cfg.height
    winner = jnp.full((W * Hn,), -1, dtype=jnp.int32)
    cell_color = jnp.zeros((W * Hn,), jnp.int32)
    base = 0
    F = len(rgb_pose_indices)
    starts = list(range(0, F, batch_size))

    if projector not in ("device", "native", "auto"):
        raise ValueError(f"unknown projector {projector!r}")
    use_native = projector in ("native", "auto") and native_mod.available()
    if projector == "auto" and jnp.dtype(dtype) != jnp.float32:
        # an explicit compute dtype (e.g. the f64 oracle validation path)
        # pins the on-device chain; only "native" overrides it
        use_native = False
    if projector == "native" and not native_mod.available():
        raise RuntimeError("projector='native' needs the native library "
                           "(run `make -C native`)")

    def prep(s):
        ids = np.arange(s, min(s + batch_size, F))
        disp, rgb = load_frame_batch(ids)
        hw = disp.shape[1:]
        if projector == "native" and not np.issubdtype(disp.dtype,
                                                       np.integer):
            # an explicit engine choice must not silently degrade to the
            # raw-upload path (advisor r4); "auto" falls through by design
            raise RuntimeError(
                "projector='native' needs integer (raw sensor) disparity; "
                f"the loader yielded {disp.dtype} — use projector='auto' "
                "or 'device' for float-disparity loaders")
        if use_native and np.issubdtype(disp.dtype, np.integer):
            # paint-op path: host C++ projection; the upload is DEFERRED —
            # the main loop folds ops_group batches' ops into ONE padded
            # buffer per transfer (the tunnel charges ~26 ms latency per
            # transfer, which at batch 16 was ~1.6 ms/frame of the stage;
            # grouped it amortizes to noise)
            cells, colors = native_mod.project_frames(
                disp, rgb, poses[rgb_pose_indices[ids]], cam_cfg, map_cfg)
            return ("ops", (cells, colors), ids, hw)
        pb = np.asarray(poses[rgb_pose_indices[ids]], dtype)
        if (np.issubdtype(disp.dtype, np.integer)
                and jnp.dtype(dtype) == jnp.float32):
            # raw-bytes device path: one packed upload per batch
            return ("packed", jax.device_put(pack_frame_batch(disp, rgb, pb)),
                    ids, hw)
        # oracle path (caller-chosen compute dtype, e.g. f64)
        return ("raw", (jax.device_put(np.asarray(disp, dtype)),
                        jax.device_put(np.asarray(rgb)), jax.device_put(pb)),
                ids, hw)

    # paint-op accumulator: host projections from up to ops_group batches
    # fold into ONE padded upload + ONE paint dispatch (frame order is
    # preserved, so concatenated sequence numbers keep the exact
    # last-writer-wins semantics across the whole group)
    ops_pending: list = []

    def flush_ops():
        nonlocal winner, cell_color, base
        if not ops_pending:
            return
        cells = np.concatenate([c for c, _ in ops_pending])
        colors = np.concatenate([c for _, c in ops_pending])
        ops_pending.clear()
        buf = jax.device_put(_pad_paint_ops(cells, colors))
        winner, cell_color = paint_ops(winner, cell_color, buf,
                                       jnp.int32(base))
        base += int(buf.shape[1])

    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(prep, starts[0]) if starts else None
        for i, s in enumerate(starts):
            kind, batch_d, ids, hw = fut.result()
            if i + 1 < len(starts):
                fut = ex.submit(prep, starts[i + 1])
            if kind == "ops":
                ops_pending.append(batch_d)
                if len(ops_pending) >= max(1, ops_group):
                    flush_ops()
                continue
            flush_ops()  # order-preserving if engines ever interleave
            if kind == "raw":
                lin, colors, ok = frames_to_cells(*batch_d, map_cfg,
                                                  cam_cfg)
            else:
                lin, colors, ok = frames_to_cells_packed(
                    batch_d, len(ids), hw[0], hw[1], map_cfg, cam_cfg)
            # per-batch colors fold into the per-CELL array ON DEVICE;
            # only the final composed texture crosses back to the host
            # (per-batch color downloads dominated the stage wall on the
            # tunneled device, and keeping every point color would cost
            # ~3 GB at full scale)
            winner, cell_color = paint_cells(winner, cell_color, lin,
                                             colors, jnp.int32(base))
            base += int(lin.shape[0])
        flush_ops()

    # int32 on device: uint8 arrays hit pathological TPU lowerings
    grid_dev = jnp.asarray(np.asarray(grid_map).astype(np.int32))
    return np.asarray(_compose_texture(winner, cell_color, grid_dev))


@jax.jit
def _compose_texture(winner: jnp.ndarray, cell_color: jnp.ndarray,
                     grid_map: jnp.ndarray) -> jnp.ndarray:
    """Final texture compose on device: base = 0/1 occupancy replicated to
    3 channels (reference: texture_mapping.py:46-48), painted cells take
    their winning color, everything / 255."""
    W, Hn = grid_map.shape
    has = winner >= 0
    rgbf = jnp.stack([cell_color & 0xFF, (cell_color >> 8) & 0xFF,
                      (cell_color >> 16) & 0xFF],
                     axis=-1).astype(jnp.float32)
    base = jnp.repeat(grid_map.reshape(-1).astype(jnp.float32)[:, None],
                      3, axis=1)
    tex = jnp.where(has[:, None], rgbf, base)
    return (tex / 255.0).reshape(W, Hn, 3)


def plot_texture_map(texture_map: np.ndarray, fname: str) -> None:
    """Save the float texture as a PNG (reference: texture_mapping.py:101-116)."""
    from ..utils.png import write_png
    img = np.clip(np.asarray(texture_map) * 255.0, 0, 255).astype(np.uint8)
    write_png(fname, img)


def disk_frame_loader(dataset_num: int, disp_for_rgb: np.ndarray,
                      data_root: str = "dataRGBD",
                      shape: Tuple[int, int] = (480, 640)):
    """Frame loader over the reference's on-disk layout
    (reference: texture_mapping.py:54-62 — disparity indexed by the
    0-based sync index, rgb by rgb_idx + 1)."""
    from ..utils import native
    from ..utils.png import read_png

    H, W = shape

    def load(ids: np.ndarray):
        dpaths = [f"{data_root}/Disparity{dataset_num}/disparity{dataset_num}_"
                  f"{int(disp_for_rgb[i])}.png" for i in ids]
        rpaths = [f"{data_root}/RGB{dataset_num}/rgb{dataset_num}_"
                  f"{int(i) + 1}.png" for i in ids]
        if native.available():
            disp = native.read_png_batch(dpaths, (H, W), np.uint16)
            rgb = native.read_png_batch(rpaths, (H, W, 3), np.uint8)
        else:
            disp = np.stack([read_png(p) for p in dpaths])
            rgb = np.stack([read_png(p) for p in rpaths])
        # raw uint16 disparity: half the host->device bytes of float32;
        # the device converts exactly (frames_to_cells)
        return disp, rgb

    return load
