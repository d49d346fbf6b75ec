"""Intra-process A/B of ray-walk kernel versions at dataset-20 scale.

PERF.md protocol: inter-process variance through the tunnel is ~10%, larger
than most kernel effects, so versions are timed ALTERNATING in one process
with fresh input values per rep (the runtime memoizes value-identical
computations). Also checks bit-identity of the maps across versions.

Run AS THE ONLY python process touching the tunnel:
    python tools/raywalk_ab.py [--scans 4956] [--reps 3] [--versions 2,3]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=4956)
    ap.add_argument("--rays", type=int, default=1081)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--versions", default="2,3")
    args = ap.parse_args()
    versions = [int(v) for v in args.versions.split(",")]

    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from lidar_slam_tpu.config import SlamConfig
    from lidar_slam_tpu.models import occupancy
    from lidar_slam_tpu.ops import scan as scan_ops
    from lidar_slam_tpu.ops.raywalk import build_logodds_raywalk
    from lidar_slam_tpu.utils import io

    cfg = SlamConfig()
    from lidar_slam_tpu.utils.profiling import devices_or_die
    log(f"device: {devices_or_die()[0]}")

    def prep(seed):
        data = io.synthetic_dataset(n_steps=args.scans, n_rays=args.rays,
                                    seed=seed)
        ranges = jnp.asarray(data["lidar"]["ranges"], jnp.float32)
        points, masks = scan_ops.scans_to_points(ranges, 0.1, 30.0, cfg.lidar)
        poses = jnp.asarray(np.cumsum(
            np.random.default_rng(seed).normal(0, 0.02, (args.scans, 3)),
            axis=0), jnp.float32)
        return poses, points, masks

    inputs = [prep(30 + r) for r in range(args.reps + 1)]
    K = occupancy.adaptive_ray_cells(inputs[0][1], inputs[0][2], cfg.map,
                                     30.0)
    log(f"K = {K}, scans = {args.scans}")

    # compile + bit-identity check on rep-0 data
    grids = {}
    for v in versions:
        t0 = time.time()
        g = build_logodds_raywalk(*inputs[0], cfg.map, K, version=v)
        g.block_until_ready()
        grids[v] = np.asarray(g)
        log(f"v{v} warm-up (compile) {time.time() - t0:.1f}s")
    base = versions[0]
    for v in versions[1:]:
        d = float(np.abs(grids[v] - grids[base]).max())
        eq = "BIT-IDENTICAL" if d == 0.0 else f"max|diff|={d:g}"
        log(f"v{v} vs v{base}: {eq}")

    times = {v: [] for v in versions}
    for r in range(1, args.reps + 1):
        for v in versions:  # alternate within the rep
            t0 = time.time()
            g = build_logodds_raywalk(*inputs[r], cfg.map, K, version=v)
            g.block_until_ready()
            np.asarray(g[:2, :2])  # force a real fetch (axon timing trap)
            times[v].append(time.time() - t0)
            log(f"rep {r} v{v}: {times[v][-1]:.3f}s")
    for v in versions:
        best = min(times[v])
        log(f"v{v}: best {best:.3f}s  ({best / args.scans * 1e3:.3f} ms/scan)"
            f"  all {[f'{t:.3f}' for t in times[v]]}")


if __name__ == "__main__":
    main()
