"""Probe the scan-matching stage cost model on the real TPU.

Measures (a) the NN correspondence kernel alone, (b) one full ICP iteration,
(c) the convergence-coupling loss of chunked while_loops: each chunk runs to
its slowest pair, so the executed iteration count is sum(chunk max) rather
than sum(per-pair iters).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

from lidar_slam_tpu.config import SlamConfig
from lidar_slam_tpu.models import odometry, scan_matching
from lidar_slam_tpu.ops import icp as icp_ops
from lidar_slam_tpu.ops import scan as scan_ops
from lidar_slam_tpu.utils import io, se2


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench(fn, args_list, reps=20):
    """Dependency-chained reps: each rep perturbs the source cloud by a
    value derived from the previous output, so the runtime cannot memoize
    and cannot overlap reps."""
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    feed = jnp.float32(0.0)
    a = args_list[0]
    t0 = time.time()
    for i in range(reps):
        src = a[0] + (1e-12 * feed + 1e-9 * i)
        out = fn(src, *a[1:])
        leaf = jax.tree_util.tree_leaves(out)[0]
        feed = jnp.asarray(leaf, jnp.float32).ravel()[0]
    jax.block_until_ready(feed)
    return (time.time() - t0) / reps


def main():
    cfg = SlamConfig()
    from lidar_slam_tpu.utils.profiling import devices_or_die
    log(f"device: {devices_or_die()[0]}")
    data = io.synthetic_dataset(n_steps=4956, n_rays=1081, seed=20)
    counts = jnp.asarray(data["encoder"]["counts"], jnp.float32)
    gyro = jnp.asarray(data["imu"]["angular_velocity"], jnp.float32)
    ranges = jnp.asarray(data["lidar"]["ranges"], jnp.float32)
    points, masks = scan_ops.scans_to_points(ranges, 0.1, 30.0, cfg.lidar)
    poses = odometry.poses_from_odometry(counts, gyro)
    pts3 = icp_ops.lift_to_3d(points)
    jax.block_until_ready((pts3, masks, poses))

    C = 64
    # a few distinct chunks for memoization-proof repeats
    offs = [0, 64, 128, 192, 256]

    def chunk_args(o):
        seeds2 = se2.get_relative_pose(poses[o:o + C], poses[o + 1:o + 1 + C])
        seeds3 = se2.TSE3_from_TSE2(seeds2)
        a = (pts3[o + 1:o + 1 + C], pts3[o:o + C],
             masks[o + 1:o + 1 + C], masks[o:o + C], seeds3)
        jax.block_until_ready(a)
        return a

    args = [chunk_args(o) for o in offs]

    # (a) NN alone
    from lidar_slam_tpu.ops.nn import nearest_neighbors
    from lidar_slam_tpu.ops.pallas_nn import nearest_neighbors_pallas

    f_pal = jax.jit(lambda s, t, sm, tm, T: nearest_neighbors_pallas(
        s, t, tm, return_matched=True))
    f_jnp = jax.jit(lambda s, t, sm, tm, T: nearest_neighbors(s, t, tm))
    log(f"NN pallas (64,1081,1081): {bench(f_pal, args)*1e3:.2f} ms")
    log(f"NN jnp    (64,1081,1081): {bench(f_jnp, args)*1e3:.2f} ms")

    # (b) one ICP iteration (pallas backend, planar)
    def one_iter(s, t, sm, tm, T):
        return icp_ops.icp_iteration(s, t, sm, tm, T, planar=True,
                                     nn_backend="pallas")

    f1 = jax.jit(one_iter)
    log(f"one ICP iteration:        {bench(f1, args)*1e3:.2f} ms")

    # fixed-iteration-count runs to get the marginal per-iteration cost
    for n_it in (2, 4, 8):
        f = jax.jit(lambda s, t, sm, tm, T, n=n_it: icp_ops.run_icp_batch(
            s, t, sm, tm, T, epsilon=0.0, max_iters=n, stopping_thresh=0.0,
            planar=True, nn_backend="pallas").T)
        log(f"run_icp_batch {n_it:2d} iters:   {bench(f, args)*1e3:.2f} ms")

    # (c) chunk coupling loss at full scale
    sm = scan_matching.poses_from_scan_matching(
        poses, points, masks, cfg.icp, chunk_size=64)
    iters = np.asarray(sm.iters)
    for Cc in (32, 64, 128, 256):
        pad = (-len(iters)) % Cc
        it = np.concatenate([iters, np.zeros(pad, iters.dtype)])
        chunk_max = it.reshape(-1, Cc).max(axis=1)
        log(f"chunk={Cc:3d}: sum(iters)={iters.sum()}, "
            f"sum(chunk_max)={chunk_max.sum()} "
            f"(efficiency {iters.mean() / (chunk_max.sum() / (len(it)//Cc)):.2f}), "
            f"executed-iter ratio {chunk_max.sum()*Cc/iters.sum():.2f}x")


if __name__ == "__main__":
    main()
