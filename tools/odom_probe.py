"""Probe: why does the 4,956-step odometry lax.scan cost ~1 s on the v5e?

Times (a) the production scan path, (b) a bare scan with the same carry,
(c) a cumsum-parallel formulation, on fresh values per call.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from lidar_slam_tpu.models import odometry


def timeit(fn, args_fn, n=3):
    out = fn(*args_fn(0))
    jax.block_until_ready(out)
    ts = []
    for i in range(1, n + 1):
        a = args_fn(i)
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    from lidar_slam_tpu.utils.profiling import devices_or_die
    devices_or_die()
    N = 4956
    rng = np.random.default_rng(0)

    def args_fn(i):
        counts = jnp.asarray(
            rng.normal(50 + i, 5, (N, 4)).astype(np.float32))
        gyro = jnp.asarray(rng.normal(0, 0.1, (N, 3)).astype(np.float32))
        jax.block_until_ready((counts, gyro))
        return counts, gyro

    t = timeit(odometry.poses_from_odometry, args_fn)
    print(f"production scan path: {t*1e3:.1f} ms")

    @jax.jit
    def bare_scan(counts, gyro):
        v = counts[1:, 0]
        dth = gyro[1:, -1]

        def step(pose, inp):
            v_i, dth_i = inp
            nxt = pose + jnp.stack([v_i, dth_i, v_i * dth_i])
            return nxt, nxt

        _, ys = jax.lax.scan(step, jnp.zeros(3), (v, dth))
        return ys

    t = timeit(bare_scan, args_fn)
    print(f"bare scan, same carry: {t*1e3:.1f} ms")

    @jax.jit
    def cumsum_odom(counts, gyro, dt=1.0 / 40.0):
        v = odometry.v_from_encoder(counts)[1:]
        dth = gyro[1:, -1] * dt
        th = jnp.cumsum(dth)
        th_prev = jnp.concatenate([jnp.zeros(1, th.dtype), th[:-1]])
        k = v * dt * jnp.sinc(dth / (2 * jnp.pi))
        dx = k * jnp.cos(th_prev + dth / 2)
        dy = k * jnp.sin(th_prev + dth / 2)
        x = jnp.cumsum(dx)
        y = jnp.cumsum(dy)
        zero = jnp.zeros((1,), x.dtype)
        return jnp.stack([
            jnp.concatenate([zero, x]),
            jnp.concatenate([zero, y]),
            jnp.concatenate([zero, th]),
        ], axis=-1)

    t = timeit(cumsum_odom, args_fn)
    print(f"cumsum formulation:   {t*1e3:.1f} ms")

    # parity of the two formulations
    c, g = args_fn(99)
    a = odometry.poses_from_odometry(c, g)
    b = cumsum_odom(c, g)
    print(f"max |scan - cumsum|:  {float(jnp.max(jnp.abs(a - b))):.3e}")


if __name__ == "__main__":
    main()
