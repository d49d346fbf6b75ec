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

    def timed(iters):
        cfg = dataclasses.replace(PoseGraphConfig(), max_lm_iters=iters,
                                  cost_rtol=0.0)
        probs = [make_problem(100 * iters + k) for k in range(REPS + 2)]
        # warm-up (compile) + fresh-value throwaway
        for init, g, _ in probs[:2]:
            np.asarray(pose_graph.optimize_with_config(init, g, cfg).poses)
        t0 = time.time()
        for init, g, _ in probs[2:]:
            out = pose_graph.optimize_with_config(init, g, cfg)
            np.asarray(out.poses)
        dt = (time.time() - t0) / REPS
        log(f"max_lm_iters={iters}: {dt * 1e3:.1f} ms/solve "
            f"(executed {int(out.iterations)})")
        return dt

    t5 = timed(5)
    t15 = timed(15)
    slope = (t15 - t5) / 10.0
    fixed = t5 - 5 * slope
    log("")
    log(f"per-LM-iteration slope:    {slope * 1e3:.2f} ms")
    log(f"fixed (assembly+dispatch): {fixed * 1e3:.2f} ms")
    log(f"5-iteration derived cost:  {(fixed + 5 * slope) * 1e3:.1f} ms")
    log(f"sequential-chain context: SPIKE fwd+bwd ~= 2 x {n_super} "
        f"dependent super-block steps per iteration -> "
        f"{slope * 1e6 / (2 * n_super):.1f} us per dependent step")


if __name__ == "__main__":
    main()
