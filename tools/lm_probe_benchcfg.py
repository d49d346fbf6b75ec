"""One-off: time optimize_trajectory under the bench's EXACT config
(default PoseGraphConfig: max_lm_iters=50, cost_rtol=1e-5) on the floor
probe's problems, to reconcile the probe's 27 ms/iter slope with the
bench's 85 ms stage. Run alone on the tunnel."""

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
    cfg = PoseGraphConfig()

    def make_fused_problem(seed):
        init, g, gt = make_problem(seed)
        prob = (init, g.between_meas, g.loop_i, g.loop_j, g.loop_meas,
                g.loop_mask)
        for a in jax.tree_util.tree_leaves(prob):
            np.asarray(a)
        return prob

    probs = [make_fused_problem(500 + k) for k in range(REPS + 2)]
    for p in probs[:2]:
        np.asarray(pose_graph.optimize_trajectory(*p, cfg).poses)
    t0 = time.time()
    its = []
    for p in probs[2:]:
        out = pose_graph.optimize_trajectory(*p, cfg)
        np.asarray(out.poses)
        its.append(int(out.iterations))
    dt = (time.time() - t0) / REPS
    log(f"bench-default cfg: {dt * 1e3:.1f} ms/solve "
        f"(iterations {its})")

    # same problems, same cfg except the forced-iteration knobs, to see
    # whether the static max_lm_iters value changes the compiled speed
    import dataclasses
    for mi in (5, 15, 50):
        c2 = dataclasses.replace(cfg, max_lm_iters=mi, cost_rtol=0.0)
        for p in probs[:2]:
            np.asarray(pose_graph.optimize_trajectory(*p, c2).poses)
        t0 = time.time()
        its = []
        for p in probs[2:]:
            out = pose_graph.optimize_trajectory(*p, c2)
            np.asarray(out.poses)
            its.append(int(out.iterations))
        dt = (time.time() - t0) / REPS
        log(f"max_lm_iters={mi} cost_rtol=0: {dt * 1e3:.1f} ms/solve "
            f"(iterations {its})")


if __name__ == "__main__":
    main()
