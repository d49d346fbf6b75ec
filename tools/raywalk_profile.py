"""Split the raywalk map-build wall time into its parts on the real TPU.

Rows (dataset-20 scale: 4,956 scans x 1,081 rays, K=608):
  full_v2        complete build (descriptors + kernel walk + clip)
  full_v1        same with the in-kernel-boundary v1 kernel
  masked_out     masks all-False: descriptors + call overhead + per-scan
                 clip pass, but zero ray visits (kernel walk eliminated)
  desc_only      lax.scan over visit_descriptors alone (XLA side, no pallas)

Each timed run uses fresh input VALUES (the runtime memoizes
value-identical computations). Usage: python tools/raywalk_profile.py
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from lidar_slam_tpu.utils.profiling import devices_or_die
    devices_or_die()

    from lidar_slam_tpu.config import SlamConfig
    from lidar_slam_tpu.models import occupancy
    from lidar_slam_tpu.ops import raywalk
    from lidar_slam_tpu.ops import scan as scan_ops
    from lidar_slam_tpu.utils import io

    cfg = SlamConfig()
    N, R = 4956, 1081

    def prep(seed):
        data = io.synthetic_dataset(n_steps=N, n_rays=R, seed=seed)
        ranges = jnp.asarray(data["lidar"]["ranges"], jnp.float32)
        points, masks = scan_ops.scans_to_points(ranges, 0.1, 30.0, cfg.lidar)
        rng = __import__("numpy").random.default_rng(seed)
        poses = jnp.asarray(
            rng.normal(0, 2.0, (N, 3)).cumsum(0) * 0.01, jnp.float32)
        return poses, points[..., :2], masks

    sets = [prep(s) for s in (30, 31, 32)]
    K = max(occupancy.adaptive_ray_cells(p, m, cfg.map, 30.0)
            for _, p, m in sets)
    print(f"K = {K}", file=sys.stderr)

    @jax.jit
    def desc_only(poses, pts, masks):
        def step(c, inp):
            pose, p, m = inp
            d = raywalk.visit_descriptors(pose, p, m, cfg.map, K)
            return c + d[-1].sum() + d[-2].sum(), None
        out, _ = jax.lax.scan(step, jnp.int32(0), (poses, pts, masks))
        return out

    def run(name, fn, args_list):
        fn(*args_list[0]).block_until_ready()  # compile + warm
        ts = []
        for a in args_list[1:]:
            t0 = time.time()
            fn(*a).block_until_ready()
            ts.append(time.time() - t0)
        print(f"{name:12s} {min(ts):.3f}s  ({', '.join(f'{t:.3f}' for t in ts)})",
              file=sys.stderr)

    build = lambda v: (lambda p, x, m: raywalk.build_logodds_raywalk(
        p, x, m, cfg.map, K, version=v))
    run("full_v2", build(2), [(p, x, m) for p, x, m in sets])
    run("full_v1", build(1), [(p, x, m) for p, x, m in sets])
    off = [(p, x, jnp.zeros_like(m)) for p, x, m in sets]
    run("masked_out", build(2), off)
    run("desc_only", desc_only, [(p, x, m) for p, x, m in sets])


if __name__ == "__main__":
    main()
