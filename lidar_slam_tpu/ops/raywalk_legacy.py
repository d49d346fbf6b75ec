"""Superseded ray-walk kernel generations (v1, v2, v3/v4, v7).

The production map build lives in ops/raywalk.py (v8 per-scan + v11 fused
multi-scan). These earlier kernels are kept because they still earn their
bytes:

  - v1 is the PRODUCTION FALLBACK when the v2+ precomputed-visit capacity
    limits are exceeded (raywalk._resolve_version: K > _NCROSS * TS, or a
    grid beyond the packed word's tile fields) — it derives walk boundaries
    in-kernel, so it has no such limits;
  - v2/v3/v4/v7 are the interpret-mode conformance oracles and A/B
    baselines (tests/test_raywalk.py sweeps every version against the
    scatter path bit-for-bit; tools/raywalk_ab.py measures them).

Design history (what changed at each step, and the measured v5e numbers)
is in the per-kernel comments below and PERF.md. All versions produce
bit-identical maps — same visit order, same float accumulation order.

Semantics are the reference's occupancy update (modules/ogm.py:149-188);
see ops/raywalk.py for the full contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .raywalk import _BIG, _LANES, TS, visit_descriptors, _visit_words


def _make_kernel(n_rays: int, log4: float, clip: float | None):
    """v1: walk boundaries computed IN-KERNEL from per-ray scalars.

    Every visit's ~30-op scalar chain — including two integer divisions —
    sits on the loop-carried critical path (the next visit's start k is the
    current visit's exit k). No capacity limits: this is the fallback for
    K or grid sizes the packed v2+ descriptors cannot encode."""
    # keep as Python floats: jnp scalars would be captured tracer constants
    # clip=None builds an UNCLIPPED kernel (per-scan DELTA for the sharded
    # psum-of-deltas path, where the clip applies after the all-reduce)
    log4 = float(log4)
    clip = None if clip is None else float(clip)

    def kernel(steep_ref, sM_ref, sm_ref, sgM_ref, sgm_ref, dM_ref,
               dm_ref, c_ref, kin_ref, kout_ref, grid_in_ref, grid_ref):
        del grid_in_ref  # aliased with grid_ref
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (TS, _LANES), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (TS, _LANES), 1)

        def ray_body(r, _):
            steep = steep_ref[r]
            sM = sM_ref[r]
            sm = sm_ref[r]
            sgM = sgM_ref[r]
            sgm = sgm_ref[r]
            dM = jnp.maximum(dM_ref[r], 1)
            dm = dm_ref[r]
            c = c_ref[r]
            k_out = kout_ref[r]
            # ray-invariant scalars hoisted out of the visit loop (the
            # per-visit scalar chain is the kernel's critical path)
            stp = steep == 1
            sgM_pos = sgM > 0
            sgm_pos = sgm > 0
            tsz_major = jnp.where(stp, _LANES, TS)
            tsz_minor = jnp.where(stp, TS, _LANES)
            dm_safe = jnp.maximum(dm, 1)
            has_minor = dm > 0
            # ray-invariant vector operands of the per-visit mask chain
            driver_iota = jnp.where(stp, l_iota, s_iota)
            oth_iota = jnp.where(stp, s_iota, l_iota)
            dM_f = dM.astype(jnp.float32)

            def visit(k):
                # scalar-core int division is fine; only the VECTOR int
                # division is slow (see the f32 quotient trick below)
                m = (k * dm + c) // dM
                Mc = sM + sgM * k
                Nc = sm + sgm * m
                row = jnp.where(stp, Nc, Mc)
                lane = jnp.where(stp, Mc, Nc)
                rt = (row // TS) * TS
                lt = (lane // _LANES) * _LANES
                # next k at which the major coordinate leaves its tile dim
                tb_major = jnp.where(stp, lt, rt)
                off = Mc - tb_major
                k_major = k + jnp.where(sgM_pos, tsz_major - off, off + 1)
                # next k at which the minor coordinate leaves its tile dim:
                # first k with m(k) >= m_bound
                tb_minor = jnp.where(stp, rt, lt)
                m_bound = jnp.where(sgm_pos,
                                    tb_minor + tsz_minor - sm,
                                    sm - tb_minor + 1)
                numb = m_bound * dM - c
                k_minor = jnp.where(
                    has_minor, -((-numb) // dm_safe), _BIG)
                k1 = jnp.minimum(jnp.minimum(k_major, k_minor), k_out + 1)

                # branchless unified mask: the major axis drives sublanes
                # (flat rays) or lanes (steep rays); one shared div chain
                drv = tb_major + driver_iota
                tb_oth = jnp.where(stp, rt, lt)
                ks = sgM * (drv - sM)
                # int32 division lowers to a slow software sequence on the
                # VPU (~4x whole-kernel cost); use the f32 quotient (operands
                # < 2^24, exact) and repair the floor with one integer
                # remainder step (the TPU divide is reciprocal-based, so the
                # raw quotient can be off by one ulp in either direction)
                num = ks * dm + c
                q0 = jnp.floor(num.astype(jnp.float32)
                               / dM_f).astype(jnp.int32)
                rem = num - q0 * dM
                ms = q0 + (rem >= dM).astype(jnp.int32) \
                    - (rem < 0).astype(jnp.int32)
                oth = sm + sgm * ms - tb_oth
                mk = (ks >= k) & (ks < k1) & (oth_iota == oth)
                delta = jnp.where(
                    mk, jnp.where(ks == k_out, log4, -log4), 0.0)
                rts = pl.multiple_of(rt, TS)
                lts = pl.multiple_of(lt, _LANES)
                tile = grid_ref[pl.ds(rts, TS), pl.ds(lts, _LANES)]
                grid_ref[pl.ds(rts, TS), pl.ds(lts, _LANES)] = tile + delta
                return k1

            jax.lax.while_loop(lambda k: k <= k_out, visit, kin_ref[r])
            return 0

        jax.lax.fori_loop(0, n_rays, ray_body, 0)
        if clip is not None:
            # per-scan clip (reference ogm.py:188), fused before writeback
            grid_ref[:] = jnp.clip(grid_ref[:], -clip, clip)

    return kernel


def _make_kernel_v2(n_rays: int, log4: float, clip: float | None):
    """v2: precomputed visit descriptors.

    v1 derives each tile visit's geometry (tile coords, k interval) from
    scalar math INSIDE the walk loop. v2 moves that boundary math to the
    XLA side (raywalk.visit_descriptors), vectorized over rays on the VPU,
    and hands the kernel one packed int32 word per visit (layout documented
    at raywalk.visit_descriptors). The kernel's per-visit scalar work is
    then 1 SMEM load + 6 shift/mask ops with no divisions and no dependency
    between consecutive visits, so the vector RMWs pipeline. A ray's visit
    list is terminated by a sentinel word with k_start = K (> any k_out)."""
    log4 = float(log4)
    clip = None if clip is None else float(clip)

    def kernel(steep_ref, sM_ref, sm_ref, sgM_ref, sgm_ref, dM_ref,
               dm_ref, c_ref, kin_ref, kout_ref, desc_ref,
               grid_in_ref, grid_ref):
        del grid_in_ref, kin_ref  # aliased with grid_ref; k_in is desc[0]
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (TS, _LANES), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (TS, _LANES), 1)

        def ray_body(r, _):
            steep = steep_ref[r]
            sM = sM_ref[r]
            sm = sm_ref[r]
            sgM = sgM_ref[r]
            sgm = sgm_ref[r]
            dM = jnp.maximum(dM_ref[r], 1)
            dm = dm_ref[r]
            c = c_ref[r]
            k_out = kout_ref[r]
            stp = steep == 1
            driver_iota = jnp.where(stp, l_iota, s_iota)
            oth_iota = jnp.where(stp, s_iota, l_iota)
            dM_f = dM.astype(jnp.float32)

            def visit(carry):
                vn, d = carry
                k0 = d & 1023
                k1 = (d >> 10) & 1023
                lt = ((d >> 20) & 15) * _LANES
                rt = (d >> 24) * TS
                tb_major = jnp.where(stp, lt, rt)
                tb_oth = jnp.where(stp, rt, lt)
                drv = tb_major + driver_iota
                ks = sgM * (drv - sM)
                # f32 quotient + one-step integer repair (see v1 kernel)
                num = ks * dm + c
                q0 = jnp.floor(num.astype(jnp.float32)
                               / dM_f).astype(jnp.int32)
                rem = num - q0 * dM
                ms = q0 + (rem >= dM).astype(jnp.int32) \
                    - (rem < 0).astype(jnp.int32)
                oth = sm + sgm * ms - tb_oth
                mk = (ks >= k0) & (ks < k1) & (oth_iota == oth)
                delta = jnp.where(
                    mk, jnp.where(ks == k_out, log4, -log4), 0.0)
                rts = pl.multiple_of(rt, TS)
                lts = pl.multiple_of(lt, _LANES)
                tile = grid_ref[pl.ds(rts, TS), pl.ds(lts, _LANES)]
                grid_ref[pl.ds(rts, TS), pl.ds(lts, _LANES)] = tile + delta
                return vn + 1, desc_ref[r, vn]

            jax.lax.while_loop(lambda cv: (cv[1] & 1023) <= k_out, visit,
                               (jnp.int32(1), desc_ref[r, 0]))
            return 0

        jax.lax.fori_loop(0, n_rays, ray_body, 0)
        if clip is not None:
            # per-scan clip (reference ogm.py:188), fused before writeback
            grid_ref[:] = jnp.clip(grid_ref[:], -clip, clip)

    return kernel


# ---------------------------------------------------------------------------
# v3: affine on-ray test (no per-visit division).
#
# v2's per-visit vector chain reconstructs the Bresenham minor coordinate
# with a floor division per lane (f32 quotient + integer repair, ~10 vector
# ops) and compares it against the tile's row iota. v3 removes the division
# entirely: a cell (driver position d, other position o) lies on the ray iff
#
#   m(k) == m_cand  where  k = sgM*(tb_major + d - sM),
#                          m_cand = sgm*(tb_oth + o - sm)
#   ⟺  0 <= k*dm + c - m_cand*dM < dM
#
# and the middle expression is AFFINE in the two tile iotas:
#
#   val(d, o) = C + ca*d + cb*o,   ca = sgM*dm,  cb = -sgm*dM  (per-ray)
#   C = c + ca*(tb_major - sM) + cb*(tb_oth - sm)              (per-visit
#                                                               SCALAR)
#
# so the kernel hoists V0 = ca*DR + cb*OT once per ray (DR/OT = the iota
# carrying the driver/other axis for this ray's orientation) and each visit
# is one scalar broadcast add + compares:
#
#   val = V0 + C;  on_ray = (0 <= val) & (val < dM)
#   in_span = (d_lo <= DR) & (DR <= d_hi)    d_lo/d_hi/d_end = driver-axis
#   delta = where(on_ray & in_span,          positions of k0/k1-1/k_out,
#                 where(DR == d_end, +log4, -log4), 0)   computed on the
#   tile += delta                                        SCALAR core
#
# ~15 vector ops per visit vs v2's ~29, exact integer arithmetic (operands
# < 2^22), bit-identical maps. Same packed visit descriptors as v2. Both
# range tests further fold to ONE unsigned compare each (negatives wrap
# high; empty visits route d_lo out of range) — measured another 8% on the
# v5e (version=4 keeps the signed variant for A/B).
# ---------------------------------------------------------------------------


def _make_kernel_v3(n_rays: int, log4: float, clip: float | None,
                    unsigned_cmp: bool = True):
    log4 = float(log4)
    clip = None if clip is None else float(clip)

    def kernel(steep_ref, sM_ref, sm_ref, sgM_ref, sgm_ref, dM_ref,
               dm_ref, c_ref, kin_ref, kout_ref, desc_ref,
               grid_in_ref, grid_ref):
        del grid_in_ref, kin_ref  # aliased with grid_ref; k_in is desc[0]
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (TS, _LANES), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (TS, _LANES), 1)

        def ray_body(r, _):
            steep = steep_ref[r]
            sM = sM_ref[r]
            sm = sm_ref[r]
            sgM = sgM_ref[r]
            sgm = sgm_ref[r]
            dM = jnp.maximum(dM_ref[r], 1)
            dm = dm_ref[r]
            c = c_ref[r]
            k_out = kout_ref[r]
            stp = steep == 1
            ca = sgM * dm
            cb = -sgm * dM
            # per-ray hoists: driver-axis iota and the affine iota term
            DR = jnp.where(stp, l_iota, s_iota)
            V0 = ca * DR + cb * jnp.where(stp, s_iota, l_iota)
            DRu = DR.astype(jnp.uint32)

            def visit(carry):
                vn, d = carry
                k0 = d & 1023
                k1 = (d >> 10) & 1023
                lt = ((d >> 20) & 15) * _LANES
                rt = (d >> 24) * TS
                tb_major = jnp.where(stp, lt, rt)
                tb_oth = jnp.where(stp, rt, lt)
                # per-visit scalars (scalar core; off the vector path)
                C = c + ca * (tb_major - sM) + cb * (tb_oth - sm)
                base = sM - tb_major
                # driver-axis span of the half-open slot interval [k0, k1):
                # select ends BY SIGN (not min/max) so an empty visit
                # (k1 == k0, from coincident boundary crossings in the
                # sorted descriptor list) yields d_lo > d_hi and masks out
                p0 = base + sgM * k0
                p1 = base + sgM * (k1 - 1)
                pos = sgM > 0
                d_lo = jnp.where(pos, p0, p1)
                d_hi = jnp.where(pos, p1, p0)
                d_end = base + sgM * k_out

                val = V0 + C
                if unsigned_cmp:
                    # 0 <= val < dM as ONE unsigned compare (negatives wrap
                    # high); driver span likewise, with the empty case
                    # (span < 0) routed to an out-of-range d_lo so the
                    # unsigned test is always false (DR <= 127 << 1000)
                    span = d_hi - d_lo
                    empty = span < 0
                    d_lo_s = jnp.where(empty, 1000, d_lo)
                    span_u = jnp.where(empty, 0, span).astype(jnp.uint32)
                    mk = ((val.astype(jnp.uint32) < dM.astype(jnp.uint32))
                          & ((DRu - d_lo_s.astype(jnp.uint32)) <= span_u))
                else:
                    mk = ((val >= 0) & (val < dM)
                          & (DR >= d_lo) & (DR <= d_hi))
                delta = jnp.where(
                    mk, jnp.where(DR == d_end, log4, -log4), 0.0)
                rts = pl.multiple_of(rt, TS)
                lts = pl.multiple_of(lt, _LANES)
                tile = grid_ref[pl.ds(rts, TS), pl.ds(lts, _LANES)]
                grid_ref[pl.ds(rts, TS), pl.ds(lts, _LANES)] = tile + delta
                return vn + 1, desc_ref[r, vn]

            jax.lax.while_loop(lambda cv: (cv[1] & 1023) <= k_out, visit,
                               (jnp.int32(1), desc_ref[r, 0]))
            return 0

        jax.lax.fori_loop(0, n_rays, ray_body, 0)
        if clip is not None:
            # per-scan clip (reference ogm.py:188), fused before writeback
            grid_ref[:] = jnp.clip(grid_ref[:], -clip, clip)

    return kernel


# ---------------------------------------------------------------------------
# v7: fully-precomputed per-visit scalars.
#
# v5/v6 (endpoint-separated) measured SLOWER than v3 despite 2 fewer vector
# ops per visit — the walk is bound by the per-visit SCALAR chain + RMW
# issue (~36 ns/visit fixed vs ~11 ns of vector work), not by VPU
# throughput. v7 therefore attacks the scalar path: the XLA side
# precomputes, per visit,
#
#   w1 = C                      (the affine constant, full int32)
#   w2 = span | d_lo << 7 | (rtile * 16 + ltile) << 15   (sentinel: -1)
#
# so the kernel's per-visit scalar work is two SMEM loads + ~6 unpack ops
# (vs v3's ~22-op chain deriving C / d_lo / span from k0/k1). The endpoint
# test rides a per-ray scalar: the endpoint's driver-axis GRID coordinate
# d_end_g = sM + sgM * k_out; per visit d_end = d_end_g - tb_major, and the
# span test already guarantees only the visit containing slot k_out can
# match DR == d_end. Visit set, masks, and accumulation order are identical
# to v3 — maps stay bit-identical. The production v8 (ops/raywalk.py) is
# this kernel walking two visits per loop iteration.
# ---------------------------------------------------------------------------


def visit_descriptors_v7(
    pose: jnp.ndarray,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    cfg,
    K: int,
):
    """Base ray arrays + interleaved (C, w2) + d_end_g for the v7 kernel."""
    base, C, w2, d_end_g = _visit_words(pose, points, mask, cfg, K)
    # interleave (C, w2) into ONE (R, 2V) array: SMEM pads every 2-D scalar
    # row to a 512 B pitch, so two (R, V<=24) operands cost ~1.1 MB of the
    # 1 MiB SMEM (measured overflow) while one (R, 2V) array costs half that
    w = jnp.stack([C, w2], axis=-1).reshape(C.shape[0], -1)
    return base + (w, d_end_g)


def _make_kernel_v7(n_rays: int, log4: float, clip: float | None):
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

            def visit(carry):
                vn, C, w2 = carry
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
                return vn + 2, w_ref[r, vn], w_ref[r, vn + 1]

            jax.lax.while_loop(lambda cv: cv[2] >= 0, visit,
                               (jnp.int32(2), w_ref[r, 0], w_ref[r, 1]))
            return 0

        jax.lax.fori_loop(0, n_rays, ray_body, 0)
        if clip is not None:
            # per-scan clip (reference ogm.py:188), fused before writeback
            grid_ref[:] = jnp.clip(grid_ref[:], -clip, clip)

    return kernel
