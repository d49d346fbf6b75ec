"""Derive the pose-graph stage's per-LM-iteration cost empirically.

The bench stage is ~80-85 ms for 5 LM iterations at dataset-20 scale
(4,956 poses, ~495 loop factors, banded super-block solver). The floor
question: is that sequential-latency-bound (the SPIKE forward+backward
scans run ~2 x 496 dependent super-block steps per iteration) or is
there slack?

Method (same protocol as sm_floor_probe): force exact iteration counts
by disabling the convergence stop (cost_rtol=0), time the fused solve at
two max_lm_iters values with fresh problems per rep, and take the
slope = marginal cost of ONE LM iteration. The intercept is the fixed
cost: graph assembly, initial cost eval, dispatch, fetch. A fresh-value
throwaway pass precedes timing (first-timed-leg warm-in, CLAUDE.md).

Usage: python tools/lm_floor_probe.py  (alone on the tunnel)
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from lidar_slam_tpu.utils.profiling import devices_or_die
    log(f"device: {devices_or_die()[0]}")
    import numpy as np

    from lidar_slam_tpu.config import PoseGraphConfig
    from lidar_slam_tpu.models import pose_graph
    from lm_bench import make_problem

    REPS = 3
    n_super = -(-4956 // 10)

    import jax

    def drain(tree):
        # force every input transfer BEFORE the timer: the bench drains
        # all inputs with np.asarray fetches before its stage timers, so
        # the floor comparison must too (a lazy transfer's ~26 ms tunnel
        # latency would otherwise land in the "fixed" intercept)
        jax.tree_util.tree_map(
            lambda a: np.asarray(a) if hasattr(a, "block_until_ready")
            else a, tree)

    # The bench's pose-graph stage is optimize_trajectory — graph assembly
    # FUSED with the solve in one jit dispatch. optimize_with_config from
    # eager code pays a ~26 ms tunnel dispatch for every eager prep op and
    # measured 2.2x the fused stage; the floor probe must time the same
    # fused path the bench does.
    def timed(iters, probs):
        # executed iterations may fall short of max_lm_iters (the
        # 3-strike stall exit is not configurable); the slope therefore
        # divides by EXECUTED, not requested, iterations
        # solver="banded" — the bench path: SlamConfig.pose_graph pins the
        # banded exact solver (config.py), while bare PoseGraphConfig()
        # defaults to "direct" (SPIKE + Woodbury), which measures ~27 ms/
        # iteration vs banded's ~12 on the same problem (lm_probe_benchcfg)
        cfg = dataclasses.replace(PoseGraphConfig(), max_lm_iters=iters,
                                  cost_rtol=0.0, solver="banded")
        # warm-up (compile) + fresh-value throwaway
        for init, rel, li, lj, lT, lm, _ in probs[:2]:
            np.asarray(pose_graph.optimize_trajectory(
                init, rel, li, lj, lT, lm, cfg).poses)
        t0 = time.time()
        execed = 0
        for init, rel, li, lj, lT, lm, _ in probs[2:]:
            out = pose_graph.optimize_trajectory(init, rel, li, lj, lT, lm,
                                                 cfg)
            np.asarray(out.poses)
            execed += int(out.iterations)
        dt = (time.time() - t0) / REPS
        execed /= REPS
        log(f"max_lm_iters={iters}: {dt * 1e3:.1f} ms/solve "
            f"(executed mean {execed:.1f})")
        return dt, execed

    def make_fused_problem(seed):
        init, g, gt = make_problem(seed)
        # unpack the graph back into optimize_trajectory's argument list
        prob = (init, g.between_meas, g.loop_i, g.loop_j, g.loop_meas,
                g.loop_mask, gt)
        drain(prob[:-1])
        return prob

    probs_lo = [make_fused_problem(500 + k) for k in range(REPS + 2)]
    probs_hi = [make_fused_problem(1500 + k) for k in range(REPS + 2)]
    # alternate legs so tunnel drift cannot bias the slope (CLAUDE.md:
    # first-timed-leg warm-in; both variants compile before either times)
    t_lo, it_lo = timed(5, probs_lo)
    t_hi, it_hi = timed(15, probs_hi)
    t_lo2, _ = timed(5, probs_lo)
    t_hi2, _ = timed(15, probs_hi)
    t_lo, t_hi = min(t_lo, t_lo2), min(t_hi, t_hi2)
    slope = (t_hi - t_lo) / (it_hi - it_lo)
    fixed = t_lo - it_lo * slope
    log("")
    log(f"per-LM-iteration slope:    {slope * 1e3:.2f} ms")
    log(f"fixed (assembly+dispatch): {fixed * 1e3:.2f} ms")
    log(f"5-iteration derived cost:  {(fixed + 5 * slope) * 1e3:.1f} ms")
    # banded path: n_sup = 496 (30, 30) super-blocks through the two-level
    # SPIKE (q=32 -> B=16 segments): sequential depth ~2(q + B) ~ 96
    # dependent block steps per solve; the rest of the iteration is the
    # batched linearization (5.4k factor r+J), super-block H assembly
    # scatters, and two whitened cost evaluations
    q, B = 32, -(-n_super // 32)
    log(f"sequential-chain context: banded SPIKE depth ~2(q+B) = "
        f"{2 * (q + B)} dependent (30, 30) block steps per iteration -> "
        f"{slope * 1e6 / (2 * (q + B)):.0f} us per dependent step "
        f"(includes the batched linearization + assembly share)")


if __name__ == "__main__":
    main()
