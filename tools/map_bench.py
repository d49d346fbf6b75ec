"""Map-build benchmark on the real TPU: XLA-scatter path vs ray-walk kernel.

Dataset-20 shapes (4,956 scans x 1,081 rays). Warm-up and timed runs use
different data values (the runtime memoizes). Run alone on the tunnel.

    python tools/map_bench.py [n_steps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

from lidar_slam_tpu.config import SlamConfig
from lidar_slam_tpu.models import occupancy, odometry
from lidar_slam_tpu.ops import scan as scan_ops
from lidar_slam_tpu.ops.raywalk import build_logodds_raywalk
from lidar_slam_tpu.utils import io


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4956
    cfg = SlamConfig()
    from lidar_slam_tpu.utils.profiling import devices_or_die
    log(f"device: {devices_or_die()[0]}  n_steps={n_steps}")

    def prep(seed):
        data = io.synthetic_dataset(n_steps=n_steps, n_rays=1081, seed=seed)
        counts = jnp.asarray(data["encoder"]["counts"], jnp.float32)
        gyro = jnp.asarray(data["imu"]["angular_velocity"], jnp.float32)
        ranges = jnp.asarray(data["lidar"]["ranges"], jnp.float32)
        points, masks = scan_ops.scans_to_points(ranges, 0.1, 30.0, cfg.lidar)
        poses = odometry.poses_from_odometry(counts, gyro)
        return poses, points, masks

    warm = prep(20)
    timed = prep(21)
    K = max(occupancy.adaptive_ray_cells(warm[1], warm[2], cfg.map, 30.0),
            occupancy.adaptive_ray_cells(timed[1], timed[2], cfg.map, 30.0))
    log(f"K = {K}")

    def run(fn, name):
        t0 = time.time()
        g = fn(*warm)
        g.block_until_ready()
        log(f"{name}: warm-up (compile) {time.time()-t0:.1f}s")
        t0 = time.time()
        g = fn(*timed)
        g.block_until_ready()
        dt = time.time() - t0
        log(f"{name}: {dt:.2f}s = {dt/n_steps*1e3:.3f} ms/scan")
        return g, dt

    g_rw, t_rw = run(
        lambda p, pts, m: build_logodds_raywalk(p, pts, m, cfg.map, K),
        "raywalk")
    g_sc, t_sc = run(
        lambda p, pts, m: occupancy.build_logodds(p, pts, m, cfg.map, K,
                                                   backend="scatter"),
        "scatter")

    d = jnp.abs(g_rw - g_sc)
    log(f"max |raywalk - scatter| = {float(d.max()):.2e}; "
        f"speedup {t_sc/t_rw:.2f}x")
    u_rw = np.asarray(occupancy.finalize_grid(g_rw))
    u_sc = np.asarray(occupancy.finalize_grid(g_sc))
    log(f"uint8 maps equal: {bool((u_rw == u_sc).all())}")


if __name__ == "__main__":
    main()
