"""ctypes bindings to the native C++ runtime library (native/libslamio.so).

The reference's native code is all third-party C/C++ behind Python bindings
(GTSAM, scipy KDTree, sklearn DBSCAN, cv2 — see SURVEY.md section 2). This
framework's native layer is first-party: a small C++ library providing the
host-side runtime pieces that should not run in Python — PNG decode (libpng)
for the Kinect frames, a parallel texture-frame loader, an exact KDTree
(host-side conformance oracle for the on-device brute-force NN), and an
exact DBSCAN (oracle for the on-device density filter). GTSAM's role is
replaced in-JAX (models/pose_graph.py), completing the first-party
replacement of every third-party native dependency.

Build with `make -C native` (see native/Makefile). Everything degrades
gracefully to pure-Python fallbacks when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native", "libslamio.so")


def _make(path: str, force: bool) -> bool:
    """Build the native library on demand (g++ + libpng are in the image)."""
    import subprocess

    try:
        cmd = ["make", "-B"] if force else ["make"]
        subprocess.run(cmd + ["-C", os.path.dirname(path)],
                       capture_output=True, timeout=120, check=True)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.abspath(_lib_path())
    if not os.path.exists(path) and not _make(path, force=False):
        return None
    if not os.path.exists(path):
        return None
    _LIB = _bind(path)
    if _LIB is None and _make(path, force=True):
        # a stale .so built from an older source revision can dlopen fine
        # yet lack newer symbols (AttributeError below); force-rebuild once
        # and retry before degrading to the pure-Python fallbacks
        _LIB = _bind(path)
    return _LIB


def _bind(path: str) -> Optional[ctypes.CDLL]:
    lib = None
    try:
        lib = ctypes.CDLL(path)
        lib.slamio_read_png_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.slamio_read_png_info.restype = ctypes.c_int
        lib.slamio_read_png_u8.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.slamio_read_png_u8.restype = ctypes.c_int
        lib.slamio_read_png_u16.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.slamio_read_png_u16.restype = ctypes.c_int
        for name in ("slamio_read_png_batch_u8", "slamio_read_png_batch_u16"):
            fn = getattr(lib, name)
            fn.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                           ctypes.c_void_p, ctypes.c_longlong,
                           ctypes.POINTER(ctypes.c_int), ctypes.c_int]
            fn.restype = ctypes.c_int
        lib.slamio_kdtree_build.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                            ctypes.c_int]
        lib.slamio_kdtree_build.restype = ctypes.c_void_p
        lib.slamio_kdtree_query.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.c_int, ctypes.c_void_p,
                                            ctypes.c_void_p]
        lib.slamio_kdtree_query.restype = None
        lib.slamio_kdtree_free.argtypes = [ctypes.c_void_p]
        lib.slamio_kdtree_free.restype = None
        lib.slamio_dbscan.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_float,
                                      ctypes.c_int, ctypes.c_void_p]
        lib.slamio_dbscan.restype = ctypes.c_int
        lib.slamio_project_frames.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_longlong, ctypes.c_int]
        lib.slamio_project_frames.restype = ctypes.c_int
        return lib
    except (OSError, AttributeError):
        # OSError: dlopen failure; AttributeError: missing export (stale .so).
        # Must dlclose the failed mapping: glibc caches dlopen by path, so a
        # retry after `make -B` would otherwise rebind the SAME stale image
        # and fail again even though a good .so now exists on disk.
        if lib is not None:
            try:
                import _ctypes

                _ctypes.dlclose(lib._handle)
            except Exception:
                pass
        return None


def available() -> bool:
    return _load() is not None


def read_png(path: str) -> np.ndarray:
    """Decode a PNG via the native library; returns (H, W[, C]) uint8/uint16."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run `make -C native`)")
    w = ctypes.c_int()
    h = ctypes.c_int()
    channels = ctypes.c_int()
    depth = ctypes.c_int()
    rc = lib.slamio_read_png_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                                  ctypes.byref(channels), ctypes.byref(depth))
    if rc != 0:
        raise IOError(f"native PNG info failed for {path} (rc={rc})")
    shape = (h.value, w.value) if channels.value == 1 else (h.value, w.value, channels.value)
    if depth.value == 16:
        out = np.empty(shape, dtype=np.uint16)
        rc = lib.slamio_read_png_u16(path.encode(), out.ctypes.data_as(ctypes.c_void_p))
    else:
        out = np.empty(shape, dtype=np.uint8)
        rc = lib.slamio_read_png_u8(path.encode(), out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise IOError(f"native PNG decode failed for {path} (rc={rc})")
    return out


def read_png_batch(paths, shape, dtype, n_threads: int = 4) -> np.ndarray:
    """Decode a batch of same-shaped PNGs with the native thread pool.

    shape: per-image (H, W[, C]); dtype: np.uint8 or np.uint16. Returns
    (N, *shape). Raises on the first failed file.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run `make -C native`)")
    n = len(paths)
    # safety: the C decoder writes decoded_w*h*c bytes into each slot; a
    # file larger than `shape` would overflow the buffer, so validate every
    # header (cheap, header-only reads) before any pixel decode
    exp_c = shape[2] if len(shape) == 3 else 1
    exp_depth = 16 if dtype == np.uint16 else 8
    for path in paths:
        w = ctypes.c_int(); h = ctypes.c_int()
        c = ctypes.c_int(); depth = ctypes.c_int()
        rc = lib.slamio_read_png_info(path.encode(), ctypes.byref(w),
                                      ctypes.byref(h), ctypes.byref(c),
                                      ctypes.byref(depth))
        if rc != 0:
            raise IOError(f"native PNG info failed for {path} (rc={rc})")
        if (h.value, w.value, c.value, depth.value) != \
                (shape[0], shape[1], exp_c, exp_depth):
            raise ValueError(
                f"{path}: image ({h.value}x{w.value}x{c.value}@"
                f"{depth.value}bit) does not match expected "
                f"{shape} @ {exp_depth}bit")
    out = np.empty((n,) + tuple(shape), dtype=dtype)
    rcs = (ctypes.c_int * n)()
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    stride = int(np.prod(shape))
    fn = (lib.slamio_read_png_batch_u16 if dtype == np.uint16
          else lib.slamio_read_png_batch_u8)
    fn(c_paths, n, out.ctypes.data_as(ctypes.c_void_p), stride, rcs, n_threads)
    for i in range(n):
        if rcs[i] != 0:
            raise IOError(f"native PNG decode failed for {paths[i]} (rc={rcs[i]})")
    return out


def kdtree_query(target: np.ndarray, queries: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Exact nearest neighbor of each query in `target` via the native KDTree.

    The host-side conformance oracle for the on-device brute-force NN
    (ops/nn.py) — the first-party stand-in for the reference's scipy KDTree
    (reference: modules/icp.py:40,161). target (M, D), queries (N, D);
    returns (idx (N,) int32 into target, d2 (N,) float32 true squared
    distances). Ties resolve to the lowest target index (numpy argmin
    semantics, same as ops/nn.py).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run `make -C native`)")
    target = np.ascontiguousarray(target, dtype=np.float32)
    queries = np.ascontiguousarray(queries, dtype=np.float32)
    if target.ndim != 2 or queries.ndim != 2 or target.shape[1] != queries.shape[1]:
        raise ValueError(
            f"shape mismatch: target {target.shape}, queries {queries.shape}")
    m, d = target.shape
    n = queries.shape[0]
    handle = lib.slamio_kdtree_build(
        target.ctypes.data_as(ctypes.c_void_p), m, d)
    if not handle:
        raise RuntimeError(f"kdtree build failed for shape {target.shape}")
    try:
        idx = np.empty(n, dtype=np.int32)
        d2 = np.empty(n, dtype=np.float32)
        lib.slamio_kdtree_query(handle,
                                queries.ctypes.data_as(ctypes.c_void_p), n,
                                idx.ctypes.data_as(ctypes.c_void_p),
                                d2.ctypes.data_as(ctypes.c_void_p))
    finally:
        lib.slamio_kdtree_free(handle)
    return idx, d2


def project_frames(disp: np.ndarray, rgb: np.ndarray, poses: np.ndarray,
                   cam_cfg, map_cfg, n_threads: int = 0
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Project a batch of RGB-D frames to last-writer-wins paint ops.

    The host half of the texture stage's paint-op path: runs the full
    unproject chain (disparity -> depth -> registration -> K^-1 -> optical
    -> camera -> robot -> world -> grid cell; reference:
    modules/texture_mapping.py:134-224) in C++ double precision and returns
    only each frame's final (cell, color) writes, concatenated in frame
    order — typically ~100x fewer bytes than the raw sensor stream the
    device path uploads. disp (B, H, W) uint16, rgb (B, H, W, 3) uint8,
    poses (B, 3). Returns (cells (M,) int32 linear indices into the
    width*height grid, colors (M,) int32 packed r|g<<8|b<<16); the device
    folds them with the same scatter-max as the raw path
    (models/texture.py paint_cells).

    n_threads=0 (the default) sizes the worker pool to the host:
    one worker per core, capped at 8. On a 1-core host ONE worker beats
    two by ~12% measured — each worker carries a ~5.8 MB dedupe stamp
    array, and two interleaved workers thrash the cache for no extra
    parallelism. Results are bit-identical for any thread count (frames
    are independent; tests pin n_threads in {1,2,4} equality).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run `make -C native`)")
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 8)
    disp = np.ascontiguousarray(disp, dtype=np.uint16)
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    poses = np.ascontiguousarray(poses, dtype=np.float64)
    B, H, W = disp.shape
    if rgb.shape != (B, H, W, 3) or poses.shape != (B, 3):
        raise ValueError(
            f"shape mismatch: disp {disp.shape}, rgb {rgb.shape}, "
            f"poses {poses.shape}")
    cam16 = np.array([
        cam_cfg.fx, cam_cfg.fy, cam_cfg.cx, cam_cfg.cy, cam_cfg.pitch_deg,
        cam_cfg.p_rc[0], cam_cfg.p_rc[1], cam_cfg.p_rc[2],
        cam_cfg.disp_a, cam_cfg.disp_b, cam_cfg.depth_scale,
        cam_cfg.reg_scale, cam_cfg.reg_i_off, cam_cfg.reg_dd,
        cam_cfg.reg_j_off, cam_cfg.reg_div], dtype=np.float64)
    cap = B * H * W
    cells = np.empty(cap, dtype=np.int32)
    colors = np.empty(cap, dtype=np.int32)
    counts = np.empty(B, dtype=np.int32)
    total = lib.slamio_project_frames(
        disp.ctypes.data_as(ctypes.c_void_p),
        rgb.ctypes.data_as(ctypes.c_void_p),
        poses.ctypes.data_as(ctypes.c_void_p), B, H, W,
        cam16.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_double(map_cfg.world_min_x),
        ctypes.c_double(map_cfg.world_min_y),
        ctypes.c_double(map_cfg.resolution),
        map_cfg.width, map_cfg.height,
        cells.ctypes.data_as(ctypes.c_void_p),
        colors.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_longlong(cap), n_threads)
    if total < 0:
        raise RuntimeError("project_frames overflowed its output capacity")
    return cells[:total].copy(), colors[:total].copy()


def dbscan(points: np.ndarray, eps: float, min_samples: int) -> np.ndarray:
    """Exact DBSCAN labels via the native C++ oracle.

    The host-side conformance reference for the on-device density filter
    (ops/filters.py) — the first-party stand-in for sklearn's DBSCAN
    (reference: modules/localization.py:216-217). points (N, D); returns
    (N,) int32 labels, -1 = noise, clusters numbered 0..k-1 in index-order
    BFS discovery (sklearn semantics: neighborhood d <= eps, self counted
    toward min_samples).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run `make -C native`)")
    points = np.ascontiguousarray(points, dtype=np.float32)
    if points.ndim != 2:
        raise ValueError(f"points must be (N, D), got {points.shape}")
    n, d = points.shape
    labels = np.empty(n, dtype=np.int32)
    rc = lib.slamio_dbscan(points.ctypes.data_as(ctypes.c_void_p), n, d,
                           ctypes.c_float(eps), min_samples,
                           labels.ctypes.data_as(ctypes.c_void_p))
    if rc < 0:
        raise ValueError(f"native dbscan rejected arguments (rc={rc})")
    return labels
