"""Derive the scan-matching chunk-iteration floor empirically.

One production chunk-iteration (64 pairs x 1081 pts) costs ~1.30 ms
(bench util sm_ms_per_chunk_iter). This probe decomposes that number
with IN-DEVICE dependency-chained loops (a lax.fori_loop repeats the
unit K times with a value dependency, so neither the ~26 ms tunnel
dispatch nor runtime memoization can contaminate the slope):

  nn       one NN correspondence pass (the Pallas MXU argmin kernel,
           production backend) per iteration
  iter     one full icp_iteration (NN + planar Kabsch + error)
  while    run_icp_batch forced to exactly M iterations
           (epsilon=0, stopping_thresh=0) — adds the while_loop
           condition + per-pair freeze bookkeeping

Slopes are computed between two repeat counts; floor(chunk-iter) =
slope(while); the gap to the production 1.30 ms is the phased-resort
permutation + compose amortization. PERF.md "Derived stage floors".

Usage: python tools/sm_floor_probe.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from lidar_slam_tpu.utils.profiling import devices_or_die
    devices_or_die()
    import jax.numpy as jnp
    import numpy as np

    from lidar_slam_tpu.config import SlamConfig
    from lidar_slam_tpu.models import odometry
    from lidar_slam_tpu.ops import icp as icp_ops
    from lidar_slam_tpu.ops import scan as scan_ops
    from lidar_slam_tpu.utils import io, se2

    cfg = SlamConfig()
    C = 64
    data = io.synthetic_dataset(n_steps=C + 1, n_rays=1081, seed=20)
    counts = jnp.asarray(data["encoder"]["counts"], jnp.float32)
    gyro = jnp.asarray(data["imu"]["angular_velocity"], jnp.float32)
    ranges = jnp.asarray(data["lidar"]["ranges"], jnp.float32)
    points, masks = scan_ops.scans_to_points(ranges, 0.1, 30.0, cfg.lidar)
    poses = odometry.poses_from_odometry(counts, gyro)
    pts3 = icp_ops.lift_to_3d(points)
    seeds3 = se2.TSE3_from_TSE2(
        se2.get_relative_pose(poses[:-1], poses[1:]))
    src, tgt = pts3[1:], pts3[:-1]
    sm, tm = masks[1:], masks[:-1]
    T0 = seeds3

    from lidar_slam_tpu.ops.nn import nearest_neighbors

    @partial(jax.jit, static_argnames=("k",))
    def nn_chain(src, tgt, tm, k):
        def body(i, s):
            idx = nearest_neighbors(s, tgt, tm)
            # value dependency: next pass sees a perturbed source
            return s + 1e-12 * idx[..., None].astype(s.dtype)
        return jax.lax.fori_loop(0, k, body, src)

    @partial(jax.jit, static_argnames=("k",))
    def iter_chain(src, tgt, sm, tm, T, k):
        def body(i, carry):
            T, _ = carry
            T2, idx, err = icp_ops.icp_iteration(src, tgt, sm, tm, T,
                                                 planar=True)
            return (T2, err)
        return jax.lax.fori_loop(0, k, body,
                                 (T, jnp.zeros(T.shape[0], src.dtype)))

    @partial(jax.jit, static_argnames=("m",))
    def forced_icp(src, tgt, sm, tm, T, m):
        return icp_ops.run_icp_batch(src, tgt, sm, tm, T,
                                     epsilon=0.0, max_iters=m,
                                     stopping_thresh=0.0, planar=True)

    def timed(fn, reps=3):
        best = np.inf
        for r in range(reps):
            s2 = src + 1e-9 * (r + 1)
            jax.block_until_ready(s2)
            t0 = time.time()
            out = fn(s2)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            best = min(best, time.time() - t0)
        return best

    rows = {}
    for name, f1, f2, k1, k2 in (
        ("nn", lambda s: nn_chain(s, tgt, tm, 8),
               lambda s: nn_chain(s, tgt, tm, 40), 8, 40),
        ("iter", lambda s: iter_chain(s, tgt, sm, tm, T0, 8),
                 lambda s: iter_chain(s, tgt, sm, tm, T0, 40), 8, 40),
        ("while", lambda s: forced_icp(s, tgt, sm, tm, T0, 8),
                  lambda s: forced_icp(s, tgt, sm, tm, T0, 40), 8, 40),
    ):
        timed(f1)  # warm both compiles
        timed(f2)
        t1, t2 = timed(f1), timed(f2)
        slope = (t2 - t1) / (k2 - k1) * 1e3
        rows[name] = slope
        print(f"{name:6s} t({k1})={t1*1e3:7.2f}ms t({k2})={t2*1e3:7.2f}ms"
              f"  -> {slope:.3f} ms/chunk-iter")

    print(f"\nNN pass alone:             {rows['nn']:.3f} ms")
    print(f"+ Kabsch/error (iter-nn):  {rows['iter'] - rows['nn']:.3f} ms")
    print(f"+ while bookkeeping:       {rows['while'] - rows['iter']:.3f} ms")
    print(f"derived chunk-iter floor:  {rows['while']:.3f} ms")
    print("production: bench util sm_ms_per_chunk_iter (~1.30); gap = "
          "phased-resort permutation + chunk gather/compose amortized")


if __name__ == "__main__":
    main()
