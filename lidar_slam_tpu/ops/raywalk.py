"""Pallas TPU kernel: VMEM-resident log-odds map update by ray walking.

The round-1 map build applied each scan's ray cells with an XLA scatter-add
(~130M slots/s, one scalar slot at a time — the end-to-end wall, PERF.md).
This kernel replaces the scatter with a walk over the exact Bresenham cell
set (same closed form as ops/bresenham.py): the grid stays resident in
VMEM, and each visit applies up to TS=64 ray cells as ONE masked (64, 128)
vector read-modify-write, so the per-cell cost is a fraction of a VPU op
instead of a scatter slot (production v8/v11: ~21 ns per visit on the v5e).

This file holds the PRODUCTION kernels — v8 (per-scan, precomputed visit
words walked two per iteration) and v11 (whole-build fusion, grid resident
in VMEM across scans) — plus the descriptor precomputation they share.
Superseded generations (v1 = the no-capacity-limit fallback, v2/v3/v4/v7 =
interpret oracles and A/B baselines) live in ops/raywalk_legacy.py; the
version dispatch below imports them lazily.

Semantics are the reference's (modules/ogm.py:149-188), identical to
occupancy.build_logodds:
  - cells along each ray get -log4, the LAST IN-BOUNDS cell +log4
    (modules/ogm.py:181-185: out-of-bounds cells are dropped first, the
    final remaining cell is the endpoint);
  - rays are truncated to K slots tail-first (parity with the fixed-slot
    scatter path in ops/bresenham.py);
  - the whole grid is clipped to +/-logodds_clip once per scan
    (modules/ogm.py:188), in-kernel, before writeback.

Because a straight line enters and leaves the (convex) map rectangle at
most once, the in-bounds cells of a ray are a single contiguous Bresenham
slot interval [k_in, k_out]; both ends are computed closed-form on the XLA
side (ray_descriptors) and the kernel walks only that interval.

Float-order caveat: cells hit by multiple rays accumulate in ray order
(the reference's order); XLA's scatter may use a different accumulation
order, so individual log-odds can differ by ULPs from the scatter path
(sums of +/-log4 are not exactly representable). Thresholded uint8 maps
are unaffected in practice; tests assert exact equality on the interpreter
path and tight tolerances across backends.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LidarConfig, MapConfig

TS = 64        # sublane rows per grid tile visit
_LANES = 128   # lane width of a tile visit
_BIG = 1 << 28


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def ray_descriptors(
    pose: jnp.ndarray,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: MapConfig,
    K: int,
) -> Tuple[jnp.ndarray, ...]:
    """Closed-form per-ray walk descriptors for one scan.

    pose (3,), points (R, 2) robot-frame scan points, mask (R,). Returns ten
    (R,) int32 arrays: (steep, sM, sm, sgM, sgm, dM, dm, c, k_in, k_out)
    in Bresenham (major k, minor m) space, with [k_in, k_out] already
    clipped to the map bounds, the K-slot cap, and the ray mask
    (k_in > k_out encodes "skip this ray").
    """
    x, y, yaw = pose[0], pose[1], pose[2]
    cth, sth = jnp.cos(yaw), jnp.sin(yaw)
    # endpoints: rotate robot-frame points to world (reference ogm.py:160-162)
    wx = points[..., 0] * cth - points[..., 1] * sth + x
    wy = points[..., 0] * sth + points[..., 1] * cth + y
    # ray origin: robot xy + UNROTATED lidar offset (reference ogm.py:164-166)
    ox = x + LidarConfig().p_rl[0]
    oy = y + LidarConfig().p_rl[1]

    res = cfg.resolution
    sx = jnp.ceil((ox - cfg.world_min_x) / res).astype(jnp.int32) - 1
    sy = jnp.ceil((oy - cfg.world_min_y) / res).astype(jnp.int32) - 1
    ex = jnp.ceil((wx - cfg.world_min_x) / res).astype(jnp.int32) - 1
    ey = jnp.ceil((wy - cfg.world_min_y) / res).astype(jnp.int32) - 1
    sx = jnp.broadcast_to(sx, ex.shape)
    sy = jnp.broadcast_to(sy, ey.shape)

    dx0 = jnp.abs(ex - sx)
    dy0 = jnp.abs(ey - sy)
    steep = (dy0 > dx0).astype(jnp.int32)
    dM = jnp.maximum(dx0, dy0)
    dm = jnp.minimum(dx0, dy0)
    # error-accumulator constant of the closed form (ops/bresenham.py:70)
    c = jnp.where(dM > 0, dM - 1 - dM // 2, 0)

    sgx = jnp.where(sx <= ex, 1, -1).astype(jnp.int32)
    sgy = jnp.where(sy <= ey, 1, -1).astype(jnp.int32)
    is_steep = steep == 1
    sgM = jnp.where(is_steep, sgy, sgx)
    sgm = jnp.where(is_steep, sgx, sgy)
    sM = jnp.where(is_steep, sy, sx)
    sm = jnp.where(is_steep, sx, sy)
    Mhi = jnp.where(is_steep, cfg.height, cfg.width).astype(jnp.int32)
    mhi = jnp.where(is_steep, cfg.width, cfg.height).astype(jnp.int32)

    # major coordinate in [0, Mhi): k interval
    aM = jnp.where(sgM > 0, -sM, sM - (Mhi - 1))
    bM = jnp.where(sgM > 0, Mhi - 1 - sM, sM)
    # minor coordinate sm + sgm*m in [0, mhi): m interval, mapped to k via
    # m(k) = (k*dm + c) // dM  (monotone nondecreasing)
    m_ub = jnp.where(sgm > 0, mhi - 1 - sm, sm)
    m_lb = jnp.where(sgm > 0, -sm, sm - (mhi - 1))
    dms = jnp.maximum(dm, 1)
    k_ub_minor = jnp.where(
        dm > 0,
        ((m_ub + 1) * dM - 1 - c) // dms,
        jnp.where(m_ub >= 0, _BIG, -1),
    )
    # smallest k with m(k) >= m_lb:  ceil((m_lb*dM - c)/dm)
    k_lb_minor = jnp.where(
        dm > 0,
        -((c - m_lb * dM) // dms),
        jnp.where(m_lb <= 0, -_BIG, _BIG),
    )

    k_in = jnp.maximum(jnp.maximum(0, aM), k_lb_minor)
    k_out = jnp.minimum(jnp.minimum(dM, bM), k_ub_minor)
    k_out = jnp.minimum(k_out, K - 1)  # fixed-slot tail truncation parity
    valid = mask & (k_in <= k_out)
    k_in = jnp.where(valid, k_in, 1).astype(jnp.int32)
    k_out = jnp.where(valid, k_out, 0).astype(jnp.int32)

    to32 = lambda a: a.astype(jnp.int32)
    return (to32(steep), to32(sM), to32(sm), to32(sgM), to32(sgm),
            to32(dM), to32(dm), to32(c), k_in, k_out)


# ---------------------------------------------------------------------------
# Packed visit-descriptor layout (v2+; consumed by every kernel generation
# from v2 on, including the production v8/v11):
#
#   bits [24..31) row-tile index   (rt / TS — all top bits of a non-negative
#                                   int32, so <= 127 tiles; build_logodds_
#                                   raywalk guards Wp <= 127 * TS)
#   bits [20..24) lane-tile index  (lt / 128     — 4 bits)
#   bits [10..20) k_next           (exit slot, pre-min'ed with k_out + 1)
#   bits [ 0..10) k_start
#
# The kernel's per-visit scalar work is then 1 SMEM load + 6 shift/mask ops
# with no divisions and no dependency between consecutive visits, so the
# vector RMWs pipeline. A ray's visit list is terminated by a sentinel word
# with k_start = K (> any k_out).
# ---------------------------------------------------------------------------

_NCROSS = 11  # max tile crossings per axis inside K slots: ceil(608/64) + 1
V_SLOTS = 2 * _NCROSS + 2  # k_in + crossings (both axes) + sentinel


def visit_descriptors(
    pose: jnp.ndarray,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: MapConfig,
    K: int,
) -> Tuple[jnp.ndarray, ...]:
    """Per-ray walk descriptors PLUS the packed per-visit word array.

    Returns the ten ray_descriptors arrays followed by desc (R, V_SLOTS)
    int32. Requires K < 1024 (10-bit slot fields) and a padded grid of at
    most 32x16 (TS x 128) tiles."""
    base = ray_descriptors(pose, points, mask, cfg, K)
    steep, sM, sm, sgM, sgm, dM, dm, c, k_in, k_out = base

    stp = steep == 1
    tszM = jnp.where(stp, _LANES, TS)  # major-axis tile size
    tszm = jnp.where(stp, TS, _LANES)  # minor-axis tile size
    dM_safe = jnp.maximum(dM, 1)
    dm_safe = jnp.maximum(dm, 1)
    j = jnp.arange(_NCROSS, dtype=jnp.int32)

    # major-axis tile crossings after k_in: first exit then every tszM
    Mc_in = sM + sgM * k_in
    posM = jnp.mod(Mc_in, tszM)
    d_exitM = jnp.where(sgM > 0, tszM - posM, posM + 1)
    kM = (k_in + d_exitM)[:, None] + j[None, :] * tszM[:, None]

    # minor-axis crossings: m values where the minor coord exits its tile,
    # mapped to k via the smallest k with m(k) >= m_target
    m_in = (k_in * dm + c) // dM_safe
    Nc_in = sm + sgm * m_in
    posm = jnp.mod(Nc_in, tszm)
    d_exitm = jnp.where(sgm > 0, tszm - posm, posm + 1)
    m_t = (m_in + d_exitm)[:, None] + j[None, :] * tszm[:, None]
    kmin = jnp.where((dm > 0)[:, None],
                     -((c[:, None] - m_t * dM[:, None]) // dm_safe[:, None]),
                     _BIG)

    ks_all = jnp.concatenate([k_in[:, None], kM, kmin], axis=1)
    # sentinel value K: > every k_out (k_out <= K-1) and fits 10 bits
    ks_all = jnp.where(ks_all <= k_out[:, None], ks_all, K).astype(jnp.int32)
    ks_sorted = jnp.sort(ks_all, axis=1)
    # visit exit slot: next boundary, capped at k_out + 1
    k_next = jnp.minimum(
        jnp.concatenate([ks_sorted[:, 1:],
                         jnp.full_like(ks_sorted[:, :1], K)], axis=1),
        (k_out + 1)[:, None])

    valid = ks_sorted <= k_out[:, None]
    m_v = (ks_sorted * dm[:, None] + c[:, None]) // dM_safe[:, None]
    Mc = sM[:, None] + sgM[:, None] * ks_sorted
    Nc = sm[:, None] + sgm[:, None] * m_v
    row = jnp.where(stp[:, None], Nc, Mc)
    lane = jnp.where(stp[:, None], Mc, Nc)
    rtile = jnp.where(valid, row // TS, 0)
    ltile = jnp.where(valid, lane // _LANES, 0)
    ks_w = jnp.where(valid, ks_sorted, K)
    kn_w = jnp.where(valid, k_next, K)
    desc = ((rtile << 24) | (ltile << 20) | (kn_w << 10) | ks_w).astype(
        jnp.int32)
    # sentinel column so the kernel's lookahead load stays in bounds
    desc = jnp.concatenate(
        [desc, jnp.full((desc.shape[0], 1), K, jnp.int32)], axis=1)
    return base + (desc,)


def _padded_dims(cfg: MapConfig) -> Tuple[int, int]:
    return (_round_up(cfg.width, TS) + TS,
            _round_up(cfg.height, _LANES) + _LANES)


def _resolve_version(cfg: MapConfig, K: int, version: int) -> int:
    """v2 capacity limits — fall back to v1 (in-kernel boundaries, no
    precomputed visit list) when any is exceeded:
      - K <= _NCROSS * TS: visit_descriptors precomputes at most _NCROSS
        tile crossings per axis, which covers a walk span of _NCROSS * TS
        slots; beyond that, crossings would be silently MISSING and cells
        dropped (the guard is what makes that impossible, not rare)
      - packed-word field widths: k fields 10 bits (K < 1024 is implied by
        the crossing bound), lane-tile 4 bits, row-tile the remaining top
        bits (non-negative int32 => <= 127 tiles)
    """
    if version not in (1, 2, 3, 4, 7, 8, 11):
        # fail loudly: silently running a different kernel than requested
        # would poison A/B timings (bit-identity can't catch a mislabel)
        raise ValueError(f"unknown raywalk kernel version {version}; "
                         "known: 1, 2, 3, 4, 7, 8, 11")
    Wp, Hp = _padded_dims(cfg)
    if version in (2, 3, 4, 7, 8, 11) and not (K <= _NCROSS * TS
                                               and Wp <= 127 * TS
                                               and Hp <= 16 * _LANES):
        return 1
    return version


def _make_call(n_rays: int, cfg: MapConfig, interpret: bool, version: int,
               clip: float | None):
    """Build the (pallas_call, describe_fn) pair for one scan's walk."""
    Wp, Hp = _padded_dims(cfg)
    if version == 8:
        kernel = _make_kernel_v8(n_rays, cfg.logodds_ratio, clip)
        n_prefetch, describe = 12, visit_descriptors_v8
    else:
        # superseded generations (v1 = the no-capacity-limit fallback;
        # v2/v3/v4/v7 = conformance oracles + A/B baselines) live in
        # raywalk_legacy; imported lazily to keep them off the hot path
        from . import raywalk_legacy as legacy
        if version == 7:
            kernel = legacy._make_kernel_v7(n_rays, cfg.logodds_ratio, clip)
            n_prefetch, describe = 12, legacy.visit_descriptors_v7
        elif version in (3, 4):
            # 4 = v3 with signed compares (kept for A/B; measured 8% slower)
            kernel = legacy._make_kernel_v3(n_rays, cfg.logodds_ratio, clip,
                                            unsigned_cmp=version == 3)
            n_prefetch, describe = 11, visit_descriptors
        elif version == 2:
            kernel = legacy._make_kernel_v2(n_rays, cfg.logodds_ratio, clip)
            n_prefetch, describe = 11, visit_descriptors
        else:
            kernel = legacy._make_kernel(n_rays, cfg.logodds_ratio, clip)
            n_prefetch, describe = 10, ray_descriptors
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Wp, Hp), jnp.float32),
        input_output_aliases={n_prefetch: 0},
        interpret=interpret,
    )
    return call, describe


def scan_delta_raywalk(
    pose: jnp.ndarray,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: MapConfig,
    K: int,
    interpret: bool = False,
    version: int = 8,
) -> jnp.ndarray:
    """One scan's UNCLIPPED log-odds delta via the ray-walk kernel.

    Returns the (width, height) sum of this scan's per-ray +/-log4
    contributions — the associative per-scan quantity the sharded map path
    psums across ray shards before applying the reference's per-scan clip
    (modules/ogm.py:188) to the carried grid. Equal to the scatter-path
    delta (occupancy.scan_logodds_delta summed into a zero grid) up to
    float accumulation order. Callers inside a shard_map run with
    check_vma=False (parallel/sharding.py): pallas cannot produce
    varying-marked outputs through the interpret path.
    """
    version = _resolve_version(cfg, K, version)
    # points is ONE scan (R, 2) here — ray count is axis 0
    call, describe = _make_call(int(points.shape[0]), cfg, interpret,
                                version, clip=None)
    Wp, Hp = _padded_dims(cfg)
    desc = describe(pose, points, mask, cfg, K)
    delta = call(*desc, jnp.zeros((Wp, Hp), jnp.float32))
    return delta[:cfg.width, :cfg.height]


# ---------------------------------------------------------------------------
# Fully-precomputed per-visit scalars (introduced by v7; consumed by the
# production v8/v11 kernels).
#
# The walk is bound by the per-visit SCALAR chain + RMW issue (~36 ns/visit
# fixed vs ~11 ns of vector work), not VPU throughput — so the XLA side
# precomputes, per visit,
#
#   w1 = C                      (the affine on-ray-test constant, full int32)
#   w2 = span | d_lo << 7 | (rtile * 16 + ltile) << 15   (sentinel: -1)
#
# leaving the kernel two SMEM loads + ~6 unpack ops per visit (vs the ~22-op
# in-kernel derivation of C / d_lo / span from k0/k1 that raywalk_legacy's
# v3 keeps). The affine test itself: a cell (driver position d, other
# position o) lies on the ray iff 0 <= C + ca*d + cb*o < dM with ca = sgM*dm,
# cb = -sgm*dM — exact integer arithmetic, operands < 2^22 (full derivation
# in raywalk_legacy's v3 block). The endpoint test rides a per-ray scalar:
# the endpoint's driver-axis GRID coordinate d_end_g = sM + sgM * k_out; per
# visit d_end = d_end_g - tb_major, and the span test already guarantees
# only the visit containing slot k_out can match DR == d_end. Visit set,
# masks, and accumulation order are identical across every kernel
# generation — maps stay bit-identical.
# ---------------------------------------------------------------------------


def _visit_words(
    pose: jnp.ndarray,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: MapConfig,
    K: int,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared v7/v8 per-visit words: (base, C, w2, d_end_g).

    C (R, V) int32 affine constants, w2 (R, V) packed span/d_lo/tile words
    (sentinel -1 marks the end of each ray's live prefix), d_end_g (R,)
    endpoint driver-axis grid coordinates."""
    full = visit_descriptors(pose, points, mask, cfg, K)
    base, desc = full[:-1], full[-1]
    steep, sM, sm, sgM, sgm, dM, dm, c, k_in, k_out = base

    k0 = desc & 1023
    k1 = (desc >> 10) & 1023
    ltile = (desc >> 20) & 15
    rtile = desc >> 24
    rt = rtile * TS
    lt = ltile * _LANES

    stp = (steep == 1)[:, None]
    tb_major = jnp.where(stp, lt, rt)
    tb_oth = jnp.where(stp, rt, lt)
    ca = (sgM * dm)[:, None]
    # dM maxed to 1 BEFORE cb, exactly like the kernel's V0 half of the
    # affine test: a degenerate dM=0 ray (start cell == end cell) must keep
    # cb = -sgm so val = C + cb*OT still selects the minor coordinate
    cb = (-sgm * jnp.maximum(dM, 1))[:, None]
    C = c[:, None] + ca * (tb_major - sM[:, None]) + cb * (tb_oth - sm[:, None])

    base_r = sM[:, None] - tb_major
    p0 = base_r + sgM[:, None] * k0
    p1 = base_r + sgM[:, None] * (k1 - 1)
    pos = (sgM > 0)[:, None]
    d_lo = jnp.where(pos, p0, p1)
    d_hi = jnp.where(pos, p1, p0)
    span = d_hi - d_lo
    live = (k0 <= k_out[:, None]) & (span >= 0)
    d_lo_s = jnp.where(live, d_lo, 255)
    span_s = jnp.where(live, span, 0)
    tile11 = rtile * 16 + ltile
    w2 = span_s | (d_lo_s << 7) | (tile11 << 15)
    # sentinel visits (k0 > k_out) terminate the walk: sign bit set
    w2 = jnp.where(k0 <= k_out[:, None], w2, -1).astype(jnp.int32)

    d_end_g = (sM + sgM * k_out).astype(jnp.int32)
    return base, C.astype(jnp.int32), w2, d_end_g


# a visit word that provably matches nothing: d_lo = 255 > any DR (<= 127),
# span = 0, tile = 0 (a real tile, so the no-op RMW address stays in range)
_SAFE_NOOP = 255 << 7


def visit_descriptors_v8(
    pose: jnp.ndarray,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: MapConfig,
    K: int,
) -> Tuple[jnp.ndarray, ...]:
    """v7 words, padded so every ray's live visit count is EVEN.

    The v8 kernel walks visits two per loop iteration and only tests the
    FIRST of each pair for the end sentinel, so odd-count rays get one
    _SAFE_NOOP visit (mask provably empty, tile 0: adds 0.0 — exact, since
    -0.0 never occurs in a grid accumulating +/-log4) appended before the
    sentinel run. Two extra columns keep the pair-lookahead loads in
    bounds (max live count 23 -> pad at slot 23, sentinels at 24..25)."""
    base, C, w2, d_end_g = _visit_words(pose, points, mask, cfg, K)
    n = C.shape[0]
    # live visits are a prefix (k0 ascending per ray; sentinel iff k0 > k_out)
    cnt = jnp.sum((w2 >= 0).astype(jnp.int32), axis=1)[:, None]
    j = jnp.arange(w2.shape[1] + 2, dtype=jnp.int32)[None, :]
    w2p = jnp.concatenate([w2, jnp.full((n, 2), -1, jnp.int32)], axis=1)
    pad_here = (j == cnt) & ((cnt & 1) == 1)
    w2p = jnp.where(j < cnt, w2p,
                    jnp.where(pad_here, _SAFE_NOOP, -1)).astype(jnp.int32)
    Cp = jnp.concatenate([C, jnp.zeros((n, 2), jnp.int32)], axis=1)
    Cp = jnp.where(j < cnt, Cp, 0)
    w = jnp.stack([Cp, w2p], axis=-1).reshape(n, -1)
    return base + (w, d_end_g)


# ---------------------------------------------------------------------------
# v8: paired visits (2x unroll of the walk loop).
#
# v7's per-visit cost is dominated by the loop-carried scalar chain and the
# while-loop condition/branch, not VPU throughput. v8 walks TWO visits per
# iteration: consecutive visits of a ray touch DIFFERENT tiles by
# construction (a visit ends exactly where the walk crosses a tile
# boundary), so the two scalar unpack chains and RMW address computations
# are independent and can overlap, and the branch overhead halves. The
# descriptor side pads every ray's visit list to an even length with a
# provably-empty _SAFE_NOOP visit so the loop condition only ever tests the
# first word of a pair. Visit order (and so float accumulation order) is
# unchanged — maps stay bit-identical to v7/v3/v2/v1/scatter.
# ---------------------------------------------------------------------------


def _make_kernel_v8(n_rays: int, log4: float, clip: float | None):
    log4 = float(log4)
    clip = None if clip is None else float(clip)

    def kernel(steep_ref, sM_ref, sm_ref, sgM_ref, sgm_ref, dM_ref,
               dm_ref, c_ref, kin_ref, kout_ref, w_ref, deg_ref,
               grid_in_ref, grid_ref):
        del grid_in_ref, sM_ref, sm_ref, c_ref, kin_ref, kout_ref
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (TS, _LANES), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (TS, _LANES), 1)

        def ray_body(r, _):
            steep = steep_ref[r]
            sgM = sgM_ref[r]
            sgm = sgm_ref[r]
            dM = jnp.maximum(dM_ref[r], 1)
            dm = dm_ref[r]
            stp = steep == 1
            ca = sgM * dm
            cb = -sgm * dM
            DR = jnp.where(stp, l_iota, s_iota)
            V0 = ca * DR + cb * jnp.where(stp, s_iota, l_iota)
            DRu = DR.astype(jnp.uint32)
            dMu = dM.astype(jnp.uint32)
            deg = deg_ref[r]

            def emit(C, w2):
                span = w2 & 127
                d_lo = (w2 >> 7) & 255
                tile = w2 >> 15
                lt = (tile & 15) * _LANES
                rt = (tile >> 4) * TS
                d_end = deg - jnp.where(stp, lt, rt)
                val = V0 + C
                mk = ((val.astype(jnp.uint32) < dMu)
                      & ((DRu - d_lo.astype(jnp.uint32))
                         <= span.astype(jnp.uint32)))
                delta = jnp.where(
                    mk, jnp.where(DR == d_end, log4, -log4), 0.0)
                rts = pl.multiple_of(rt, TS)
                lts = pl.multiple_of(lt, _LANES)
                tile_v = grid_ref[pl.ds(rts, TS), pl.ds(lts, _LANES)]
                grid_ref[pl.ds(rts, TS), pl.ds(lts, _LANES)] = tile_v + delta

            def visit_pair(carry):
                vn, Ca, w2a, Cb, w2b = carry
                emit(Ca, w2a)
                emit(Cb, w2b)
                return (vn + 4, w_ref[r, vn], w_ref[r, vn + 1],
                        w_ref[r, vn + 2], w_ref[r, vn + 3])

            jax.lax.while_loop(
                lambda cv: cv[2] >= 0, visit_pair,
                (jnp.int32(4), w_ref[r, 0], w_ref[r, 1],
                 w_ref[r, 2], w_ref[r, 3]))
            return 0

        jax.lax.fori_loop(0, n_rays, ray_body, 0)
        if clip is not None:
            # per-scan clip (reference ogm.py:188), fused before writeback
            grid_ref[:] = jnp.clip(grid_ref[:], -clip, clip)

    return kernel


# ---------------------------------------------------------------------------
# v11: fused multi-scan build — ONE pallas_call for the whole map.
#
# v8 pays a per-scan cost for the carried grid's HBM<->VMEM round trip
# (12.4 MB/scan), the lax.scan per-step dispatch, and the SMEM prefetch.
# v11 removes it structurally — measured win 33 ms of the 0.88 s stage at
# dataset-20 scale (0.171 vs 0.178 ms/scan, bit-identical, intra-process
# A/B): the round trip rides HBM bandwidth (~61 GB over 4,956 scans
# ≈ 70 ms of which ~half overlaps), while the REST of the masked-out
# per-scan cost is per-RAY vector setup (V0/iota selects on (TS, 128)
# tiles) that v11 necessarily keeps — see PERF.md round-4 floor notes.
# Structure: the pallas grid becomes (n_scans,) and ITERATES over scans
# inside one call, with
#   - the log-odds grid as a REVISITED output block (constant index map):
#     it stays resident in VMEM across all scans and is written back to HBM
#     once, at the end;
#   - each scan's v8 visit words + per-ray scalars streamed as per-step
#     SMEM input blocks (Mosaic cannot scalar-load from VMEM with a dynamic
#     lane index — measured: "cannot statically prove index is a multiple
#     of 128" — so the words must land in SMEM, exactly like v8's scalar
#     prefetch, but re-sliced per grid step). Block-shape rules force the
#     per-scan rows into (8, C) pages — Mosaic requires the last two block
#     dims divisible by (8, 128) — so ray r's words live at row r & 7,
#     column (r >> 3) * stride: zero per-visit index math, and with C a
#     multiple of 128 every row is a 512 B-pitch multiple (SMEM pads 2-D
#     rows to 512 B, the v7 lesson), so nothing is wasted;
#   - the per-scan clip (reference modules/ogm.py:188) applied in-kernel at
#     the end of every grid step, exactly as v8 fuses it before writeback.
# Walk order, mask math, and float accumulation order are byte-for-byte
# v8's, so maps stay bit-identical to v8/v7/v3/v2/v1/scatter.
#
# (PERF.md's "v9"/"v10" name two measured/modeled-NEGATIVE design studies
# that never merged; the version number 11 keeps that history unambiguous.)
# ---------------------------------------------------------------------------

_PAIR_INTS = 2 * (V_SLOTS + 2)  # ints per ray in the v8 interleaved word row


def _fused_widths(n_rays: int) -> Tuple[int, int]:
    """(aux, words) SMEM page widths for the v11 per-scan blocks."""
    ca = _round_up(n_rays, 128)
    cw = _round_up(-(-n_rays // 8) * _PAIR_INTS, 128)
    return ca, cw


def fused_descriptors(
    poses: jnp.ndarray,
    points: jnp.ndarray,
    masks: jnp.ndarray,
    cfg: MapConfig,
    K: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-scan v8 words packed for per-step SMEM block streaming.

    Returns aux (N, 8, CA) int32 — row f in [0, 6) holds field f of
    [steep | sgM | sgm | dM | dm | d_end_g] at column r — and
    w (N, 8, CW) int32 — ray r's _PAIR_INTS interleaved (C, w2) words at
    [r & 7, (r >> 3) * _PAIR_INTS ...). Both page widths are 128-ints
    multiples (_fused_widths), so Mosaic's (8, 128) block-divisibility
    rule holds and every SMEM row is a whole number of 512 B pitches."""
    n_rays = int(points.shape[1])
    ca, cw = _fused_widths(n_rays)
    rp = _round_up(n_rays, 8)

    def one(pose, pts, m):
        out = visit_descriptors_v8(pose, pts, m, cfg, K)
        steep, sM, sm, sgM, sgm, dM, dm, c, k_in, k_out = out[:-2]
        w, deg = out[-2], out[-1]
        aux = jnp.zeros((8, ca), jnp.int32)
        for f, v in enumerate((steep, sgM, sgm, dM, dm, deg)):
            aux = aux.at[f, :n_rays].set(v.astype(jnp.int32))
        # ray r -> [r & 7, (r >> 3) * _PAIR_INTS): pad rays to a multiple
        # of 8 (pad rows are never walked — the kernel's fori stops at
        # n_rays), group-transpose, pad columns to the page width
        wp = jnp.zeros((rp, _PAIR_INTS), jnp.int32).at[:n_rays].set(w)
        wp = wp.reshape(rp // 8, 8, _PAIR_INTS).transpose(1, 0, 2)
        wp = wp.reshape(8, (rp // 8) * _PAIR_INTS)
        return aux, jnp.zeros((8, cw), jnp.int32).at[:, :wp.shape[1]].set(wp)

    return jax.vmap(one)(poses, points, masks)


def _make_kernel_v11(n_rays: int, log4: float, clip: float):
    log4 = float(log4)
    clip = float(clip)

    def kernel(aux_ref, w_ref, grid_ref):
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (TS, _LANES), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (TS, _LANES), 1)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            grid_ref[:] = jnp.zeros(grid_ref.shape, grid_ref.dtype)

        def ray_body(r, _):
            steep = aux_ref[0, 0, r]
            sgM = aux_ref[0, 1, r]
            sgm = aux_ref[0, 2, r]
            dM = jnp.maximum(aux_ref[0, 3, r], 1)
            dm = aux_ref[0, 4, r]
            deg = aux_ref[0, 5, r]
            stp = steep == 1
            ca = sgM * dm
            cb = -sgm * dM
            DR = jnp.where(stp, l_iota, s_iota)
            V0 = ca * DR + cb * jnp.where(stp, s_iota, l_iota)
            DRu = DR.astype(jnp.uint32)
            dMu = dM.astype(jnp.uint32)
            wr = r & 7
            wb = (r >> 3) * _PAIR_INTS

            def emit(C, w2):
                span = w2 & 127
                d_lo = (w2 >> 7) & 255
                tile = w2 >> 15
                lt = (tile & 15) * _LANES
                rt = (tile >> 4) * TS
                d_end = deg - jnp.where(stp, lt, rt)
                val = V0 + C
                mk = ((val.astype(jnp.uint32) < dMu)
                      & ((DRu - d_lo.astype(jnp.uint32))
                         <= span.astype(jnp.uint32)))
                delta = jnp.where(
                    mk, jnp.where(DR == d_end, log4, -log4), 0.0)
                rts = pl.multiple_of(rt, TS)
                lts = pl.multiple_of(lt, _LANES)
                tile_v = grid_ref[pl.ds(rts, TS), pl.ds(lts, _LANES)]
                grid_ref[pl.ds(rts, TS), pl.ds(lts, _LANES)] = tile_v + delta

            def visit_pair(carry):
                vn, Ca, w2a, Cb, w2b = carry
                emit(Ca, w2a)
                emit(Cb, w2b)
                return (vn + 4,
                        w_ref[0, wr, wb + vn], w_ref[0, wr, wb + vn + 1],
                        w_ref[0, wr, wb + vn + 2], w_ref[0, wr, wb + vn + 3])

            jax.lax.while_loop(
                lambda cv: cv[2] >= 0, visit_pair,
                (jnp.int32(4), w_ref[0, wr, wb], w_ref[0, wr, wb + 1],
                 w_ref[0, wr, wb + 2], w_ref[0, wr, wb + 3]))
            return 0

        jax.lax.fori_loop(0, n_rays, ray_body, 0)
        # per-scan clip (reference ogm.py:188) on the VMEM-resident grid
        grid_ref[:] = jnp.clip(grid_ref[:], -clip, clip)

    return kernel


def _build_fused(poses, points, masks, cfg: MapConfig, K: int,
                 interpret: bool) -> jnp.ndarray:
    n_scans = int(poses.shape[0])
    n_rays = int(points.shape[1])
    Wp, Hp = _padded_dims(cfg)
    ca, cw = _fused_widths(n_rays)
    aux, w = fused_descriptors(poses, points, masks, cfg, K)
    call = pl.pallas_call(
        _make_kernel_v11(n_rays, cfg.logodds_ratio, cfg.logodds_clip),
        grid=(n_scans,),
        in_specs=[
            pl.BlockSpec((1, 8, ca), lambda s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, cw), lambda s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((Wp, Hp), lambda s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wp, Hp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )
    return call(aux, w)[:cfg.width, :cfg.height]


@partial(jax.jit, static_argnames=("cfg", "K", "interpret", "version"))
def build_logodds_raywalk(
    poses: jnp.ndarray,
    points: jnp.ndarray,
    masks: jnp.ndarray,
    cfg: MapConfig,
    K: int,
    init: jnp.ndarray | None = None,
    interpret: bool = False,
    version: int = 11,
) -> jnp.ndarray:
    """Full map build with the ray-walk kernel (reference ogm.py:45-59).

    Drop-in replacement for occupancy.build_logodds (same semantics; see
    module docstring for the float-accumulation-order caveat). version=11
    (default) fuses the WHOLE build into one pallas_call — pallas grid
    over scans, map resident in VMEM across scans, per-scan words streamed
    as SMEM blocks (intra-process A/B on the v5e at dataset-20 scale:
    0.171 ms/scan vs v8's 0.178; init != None falls back to v8). v8 runs
    a lax.scan of per-scan pallas_calls walking v7's precomputed per-visit
    words TWO per loop iteration (consecutive visits never share a tile,
    so the pair's chains overlap; 0.178-0.180 ms/scan vs v7's 0.190); v7
    precomputes the per-visit affine constant and packed span/tile word on
    the XLA side (vs v3's 0.220 in-kernel derivation); v3/v4 derive them
    in-kernel from the v2 packed visit words; v2 keeps the per-visit
    division chain; v1 computes the walk boundaries in-kernel. All
    versions are bit-identical.
    """
    n_rays = int(points.shape[1])
    if version == 11 and init is not None:
        # the fused kernel zero-initializes its VMEM-resident grid; callers
        # with an init grid (single-scan incremental paints, window
        # rebuilds) take the per-scan v8 path, where init is free
        version = 8
    version = _resolve_version(cfg, K, version)
    if version == 11:
        return _build_fused(poses, points, masks, cfg, K, interpret)
    call, describe = _make_call(n_rays, cfg, interpret, version,
                                clip=cfg.logodds_clip)
    Wp, Hp = _padded_dims(cfg)

    if init is None:
        grid0 = jnp.zeros((Wp, Hp), jnp.float32)
    else:
        grid0 = jnp.zeros((Wp, Hp), jnp.float32).at[
            :cfg.width, :cfg.height].set(init)

    def step(grid, inp):
        pose, pts, m = inp
        desc = describe(pose, pts, m, cfg, K)
        return call(*desc, grid), None

    grid, _ = jax.lax.scan(step, grid0, (poses, points, masks))
    return grid[:cfg.width, :cfg.height]
