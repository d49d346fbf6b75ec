"""Empirical VPU issue-cost probe: derive the ray-walk visit floor.

The v8 walk kernel costs ~35 ns/visit at dataset scale (bench util
map_ns_per_visit). This probe decomposes that number from first
principles by timing stripped Pallas loops that replicate the v8
per-visit work (ops/raywalk.py _make_kernel_v8 emit()) in isolation:

  oneop   one (64, 128) f32 add per iteration          -> per-op issue cost
  vec     the full 10-op emit() vector chain + tile RMW,
          constants derived from the loop index (no SMEM)  -> vector slope
  full    vec + the paired SMEM word loads + scalar unpack
          chain exactly as v8                           -> + scalar slope

Each mode is timed at two iteration counts; the SLOPE between them is the
marginal per-visit cost (fixed call overhead cancels). The derived floor
  floor(visit) = slope(full)
is compared against the production kernel's measured ns/visit; the
difference is v8's while-loop/sentinel handling that the probe's
fori_loop replaces. PERF.md "Derived stage floors" carries the numbers.

Round-5 addition (VERDICT r4 item 3) — the PER-RAY SETUP slope, probed
instead of modeled. v8's ray_body runs, before any visit, 6 aux SMEM
loads + the DR/V0/DRu vector prologue (two (64, 128) iota selects, two
multiplies, one add, one bitcast) whose ~0.2 s share of the map stage
was previously arithmetic, not measurement:

  ray1    per iteration: full per-ray aux-load + DR/V0 prologue + ONE
          emit() visit (the visit keeps V0 live against DCE)
  ray2    same prologue + TWO emit() visits

  setup slope = 2*slope(ray1) - slope(ray2)   (the visit term cancels)

Both modes iterate RAYS, so their slopes are ns/RAY; the in-situ
per-visit cost slope(ray2) - slope(ray1) cross-checks the 'full' mode.

Usage: python tools/vpu_probe.py [--m1 16384] [--m2 65536]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

TS = 64
LANES = 128
GRID = 512  # (512, 512) f32 VMEM-resident probe grid = 1 MB


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m1", type=int, default=16384)
    ap.add_argument("--m2", type=int, default=65536)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--modes", type=str,
                    default="rmw,vec,full,fullv,ray1,ray2",
                    help="comma-separated subset (a failed Mosaic compile "
                         "can wedge the remote compile helper for "
                         "SUBSEQUENT kernels in the same process — run "
                         "fullv separately from the ray modes)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from lidar_slam_tpu.utils.profiling import devices_or_die
    devices_or_die()
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_row_t = GRID // TS     # 8
    n_lane_t = GRID // LANES  # 4

    def make_kernel(n_pairs: int, mode: str, reps: int):
        ray_w = min(n_pairs, 4096)

        def kernel(words_ref, *refs):
            if mode == "fullv":
                wv_ref, _, grid_ref = refs
            else:
                _, grid_ref = refs
            s_iota = jax.lax.broadcasted_iota(jnp.int32, (TS, LANES), 0)
            l_iota = jax.lax.broadcasted_iota(jnp.int32, (TS, LANES), 1)
            V0 = 3 * s_iota + 5 * l_iota
            su = s_iota.astype(jnp.uint32)

            def emit(C, w2):
                # the v8 emit() op mix (ops/raywalk.py): unpack, affine
                # membership test, endpoint select, masked tile RMW
                span = w2 & 127
                d_lo = (w2 >> 7) & 255
                tile = w2 >> 15
                lt = (tile & 15) * LANES
                rt = (tile >> 4) * TS
                d_end = C & 63
                val = V0 + C
                mk = ((val.astype(jnp.uint32) < jnp.uint32(60000))
                      & ((su - d_lo.astype(jnp.uint32))
                         <= span.astype(jnp.uint32)))
                delta = jnp.where(
                    mk, jnp.where(s_iota == d_end, 1.386, -1.386), 0.0)
                rts = pl.multiple_of(rt, TS)
                lts = pl.multiple_of(lt, LANES)
                tv = grid_ref[pl.ds(rts, TS), pl.ds(lts, LANES)]
                grid_ref[pl.ds(rts, TS), pl.ds(lts, LANES)] = tv + delta

            if mode == "rmw":
                def body(i, _):
                    # paired alternating-tile RMWs, no mask chain: the
                    # memory/issue floor of the two tile updates alone
                    rt = ((i & 7) * TS)
                    rt2 = (((i + 3) & 7) * TS)
                    for r in (rt, rt2):
                        rts = pl.multiple_of(r, TS)
                        tv = grid_ref[pl.ds(rts, TS), pl.ds(0, LANES)]
                        grid_ref[pl.ds(rts, TS), pl.ds(0, LANES)] = tv + 1.0
                    return 0
            elif mode == "vec":
                def body(i, _):
                    # constants from the index (cheap & / >> only):
                    # 2 visits, distinct tiles
                    t1 = (i & 3) | (((i >> 2) & 7) << 4)
                    t2 = ((i + 1) & 3) | ((((i >> 2) + 3) & 7) << 4)
                    emit(i & 1023, 37 | (5 << 7) | (t1 << 15))
                    emit((i + 7) & 1023, 51 | (9 << 7) | (t2 << 15))
                    return 0
            elif mode == "full":
                def body(i, _):
                    # v8's per-pair scalar side: 4 SMEM loads + unpack
                    emit(words_ref[0, i], words_ref[1, i])
                    emit(words_ref[2, i], words_ref[3, i])
                    return 0
            elif mode == "fullv":
                # words read as SCALARS from a VMEM block instead of
                # SMEM scalar-prefetch: decides whether a multi-scan
                # kernel can keep descriptors in VMEM (SMEM cannot hold
                # several scans' worth — CLAUDE.md row-pitch padding)
                def body(i, _):
                    emit(wv_ref[0, i], wv_ref[1, i])
                    emit(wv_ref[2, i], wv_ref[3, i])
                    return 0
            elif mode in ("ray1", "ray2"):
                # v8 ray_body per-RAY prologue, replicated exactly
                # (ops/raywalk.py _make_kernel_v8): 6 aux scalar loads,
                # scalar ca/cb, then the vector DR/V0/DRu setup on the
                # (TS, LANES) tile, followed by 1 or 2 visits that
                # consume V0 (keeping the prologue live against DCE).
                # The word table is capped at RAY_W columns (i & (RAY_W-1))
                # so the 10-row SMEM operand stays ~160 KB — (10, 16384)
                # = 655 KB crashes the Mosaic compile helper where the
                # 4-row pair modes (256 KB) compile fine.
                def body(iw, _):
                    i = iw & (ray_w - 1)
                    steep = words_ref[4, i]
                    sgM = words_ref[5, i]
                    sgm = words_ref[6, i]
                    dM = jnp.maximum(words_ref[7, i], 1)
                    dm = words_ref[8, i]
                    deg = words_ref[9, i]
                    stp = steep == 1
                    ca = sgM * dm
                    cb = -sgm * dM
                    DR = jnp.where(stp, l_iota, s_iota)
                    V0r = ca * DR + cb * jnp.where(stp, s_iota, l_iota)
                    DRu = DR.astype(jnp.uint32)
                    dMu = dM.astype(jnp.uint32)

                    def emit_r(C, w2):
                        # production emit(): d_end from the per-ray deg
                        span = w2 & 127
                        d_lo = (w2 >> 7) & 255
                        tile = w2 >> 15
                        lt = (tile & 15) * LANES
                        rt = (tile >> 4) * TS
                        d_end = deg - jnp.where(stp, lt, rt)
                        val = V0r + C
                        mk = ((val.astype(jnp.uint32) < dMu)
                              & ((DRu - d_lo.astype(jnp.uint32))
                                 <= span.astype(jnp.uint32)))
                        delta = jnp.where(
                            mk, jnp.where(DR == d_end, 1.386, -1.386), 0.0)
                        rts = pl.multiple_of(rt, TS)
                        lts = pl.multiple_of(lt, LANES)
                        tv = grid_ref[pl.ds(rts, TS), pl.ds(lts, LANES)]
                        grid_ref[pl.ds(rts, TS), pl.ds(lts, LANES)] = \
                            tv + delta

                    emit_r(words_ref[0, i], words_ref[1, i])
                    if mode == "ray2":
                        emit_r(words_ref[2, i], words_ref[3, i])
                    return 0
            else:
                raise ValueError(mode)

            def rep_body(r, _):
                jax.lax.fori_loop(0, n_pairs, body, 0)
                return 0

            # outer in-kernel repeat: total visits = 2 * n_pairs * reps,
            # so the ~26 ms tunnel dispatch amortizes to noise
            jax.lax.fori_loop(0, reps, rep_body, 0)

        return kernel

    def build_call(n_pairs, mode, reps):
        n_in = 2 if mode == "fullv" else 1
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            make_kernel(n_pairs, mode, reps), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((GRID, GRID), jnp.float32),
            input_output_aliases={n_in: 0})

    rng = np.random.default_rng(0)

    def words_for(n_pairs, seed, rays=False):
        r = np.random.default_rng(seed)
        if rays:
            n_pairs = min(n_pairs, 4096)  # kernel indexes i & (ray_w - 1)
        w = np.empty((10 if rays else 4, n_pairs), np.int32)
        w[0] = r.integers(0, 1024, n_pairs)
        w[2] = r.integers(0, 1024, n_pairs)
        for row in (1, 3):
            tile = (r.integers(0, n_lane_t, n_pairs)
                    | (r.integers(0, n_row_t, n_pairs) << 4))
            w[row] = (r.integers(0, 64, n_pairs)
                      | (r.integers(0, 64, n_pairs) << 7) | (tile << 15))
        if rays:
            # per-ray aux fields with dataset-realistic distributions
            w[4] = r.integers(0, 2, n_pairs)            # steep
            w[5] = r.integers(0, 2, n_pairs) * 2 - 1    # sgM
            w[6] = r.integers(0, 2, n_pairs) * 2 - 1    # sgm
            w[7] = r.integers(1, 608, n_pairs)          # dM
            w[8] = r.integers(0, 64, n_pairs)           # dm
            w[9] = r.integers(0, 128, n_pairs)          # deg (d_end_g)
        return w

    def timed(mode, n_pairs, reps_k):
        if mode == "fullv":
            call = jax.jit(lambda w, g: build_call(n_pairs, mode, reps_k)(
                w, w, g))
        else:
            call = jax.jit(
                lambda w, g: build_call(n_pairs, mode, reps_k)(w, g))
        rays = mode in ("ray1", "ray2")
        best = np.inf
        for rep in range(args.reps):
            w = jnp.asarray(words_for(n_pairs, 10 + rep, rays=rays))
            g = jnp.asarray(rng.normal(0, 1, (GRID, GRID)), jnp.float32)
            jax.block_until_ready((w, g))
            t0 = time.time()
            out = call(w, g)
            s = float(jnp.sum(out))  # real fetch (axon: CLAUDE.md)
            best = min(best, time.time() - t0)
            del out, s
        return best

    m = args.m1
    r1, r2 = 8, 40
    print(f"mode     t({r1}x{m})   t({r2}x{m})   ns/unit (slope)")
    slopes = {}
    wanted = [s.strip() for s in args.modes.split(",") if s.strip()]
    for mode in wanted:
        try:
            timed(mode, m, r1)  # warm-up compiles
        except Exception as e:  # noqa: BLE001
            # fullv documents Mosaic's VMEM dynamic-lane scalar-load limit
            # by FAILING to compile on some toolchains — record and move on
            print(f"{mode:7s}  does not compile on this toolchain "
                  f"({str(e).splitlines()[0][:80]})")
            slopes[mode] = float("nan")
            continue
        t1 = timed(mode, m, r1)
        t2 = timed(mode, m, r2)
        # pair modes do 2 visits/iteration (unit = visit); ray modes are
        # per-RAY slopes (unit = ray-iteration)
        denom = m * (r2 - r1) * (1 if mode in ("ray1", "ray2") else 2)
        per_unit = (t2 - t1) / denom * 1e9
        slopes[mode] = per_unit
        print(f"{mode:7s}  {t1*1e3:8.2f}ms  {t2*1e3:8.2f}ms  "
              f"{per_unit:6.1f}")
    if {"rmw", "vec", "full"} <= slopes.keys():
        print(f"\npaired tile RMW alone (rmw): {slopes['rmw']:.1f} ns/visit")
        print(f"+ mask chain (vec - rmw): "
              f"{slopes['vec'] - slopes['rmw']:.1f} ns/visit")
        print(f"+ scalar SMEM/unpack (full - vec): "
              f"{slopes['full'] - slopes['vec']:.1f} ns/visit")
        print(f"derived v8 visit floor (full, fori_loop): "
              f"{slopes['full']:.1f} ns/visit")
        print("production v8 measured: bench util map_ns_per_visit "
              "(~35.5); difference = while-loop/sentinel vs fori_loop")
    if {"ray1", "ray2"} <= slopes.keys():
        setup = 2 * slopes["ray1"] - slopes["ray2"]
        visit_in_situ = slopes["ray2"] - slopes["ray1"]
        n_rays_ds = 4956 * 1081  # dataset-20 scans x rays
        print(f"\nper-ray setup (2*ray1 - ray2): {setup:.1f} ns/ray")
        print(f"in-situ visit cost (ray2 - ray1): {visit_in_situ:.1f} "
              "ns/visit"
              + (f" (cross-check vs full {slopes['full']:.1f})"
                 if "full" in slopes else ""))
        print(f"dataset-20 per-ray setup total ({n_rays_ds/1e6:.2f}M rays): "
              f"{setup * n_rays_ds / 1e9:.3f} s")


if __name__ == "__main__":
    main()
