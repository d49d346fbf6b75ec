"""The reference's OWN timing harness, reproduced: 1000 raytraces of
(0,1)->(500,200) (reference: code/pr2_utils.py:102-107 — its only
first-party benchmark; BASELINE.md row: 0.033 s on one CPU core).

Here the 1000 traces are ONE vectorized bresenham_fixed call (the closed
-form trace has no sequential dependency), timed end-to-end including the
host fetch. Runs on whatever backend the process has (pass --cpu to force
the host platform; default touches the TPU tunnel).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--traces", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lidar_slam_tpu.ops.bresenham import bresenham_fixed
    from lidar_slam_tpu.utils.profiling import devices_or_die

    print(f"device: {devices_or_die()[0]}", file=sys.stderr)

    n = args.traces
    K = 512  # covers the 500-step major axis
    # the reference harness repeats the identical ray 1000x; vary the start
    # by 0 (identical) but the runtime memoizes VALUES, so instead trace
    # 1000 distinct rays of the same shape (start y offset cycles 0..9,
    # same major-axis length) — strictly more work than the harness
    sx = jnp.zeros((n,), jnp.int32)
    sy = jnp.asarray(np.arange(n) % 10 + 1, jnp.int32)
    ex = jnp.full((n,), 500, jnp.int32)
    ey = jnp.asarray(200 + (np.arange(n) % 10), jnp.int32)

    fn = jax.jit(jax.vmap(lambda a, b, c, d: bresenham_fixed(a, b, c, d, K)))
    cells = fn(sx, sy, ex, ey)
    jax.block_until_ready(cells)  # compile
    times = []
    for r in range(args.reps):
        sy2 = (sy + r) % 50 + 1  # fresh values every rep
        t0 = time.time()
        out = fn(sx, sy2, ex, ey)
        np.asarray(out[0][:1, :1])
        times.append(time.time() - t0)
    best = min(times)
    print(f"{n} traces (distinct rays): best {best * 1e3:.2f} ms "
          f"(reference harness: 33 ms for 1000 IDENTICAL rays, 1 CPU core)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
