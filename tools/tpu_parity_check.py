"""CPU vs TPU numerical parity check (SURVEY.md section 4/7 test strategy).

Runs the hot ops on both backends with identical f32 inputs and reports
max deviations. Exact-integer ops (Bresenham cells, NN indices, DBSCAN
masks) must match bit-for-bit; floating-point stages get tolerances.

  python tools/tpu_parity_check.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def run_backend(platform):
    import jax

    jax.config.update("jax_platforms", platform)
    from lidar_slam_tpu.utils.profiling import devices_or_die
    devices_or_die()
    # fresh process state is cleanest, but jax allows platform switching
    # before first use; this script therefore runs each backend in a
    # subprocess when invoked as a whole (see main below).
    import jax.numpy as jnp

    from lidar_slam_tpu.config import IcpConfig, MapConfig, SlamConfig
    from lidar_slam_tpu.models import occupancy, odometry, scan_matching
    from lidar_slam_tpu.ops import scan as scan_ops
    from lidar_slam_tpu.utils import io

    cfg = SlamConfig(map=MapConfig(resolution=0.1, world_max_x=15,
                                   world_min_x=-15, world_max_y=15,
                                   world_min_y=-15))
    data = io.synthetic_dataset(n_steps=60, n_rays=541, seed=99)
    counts = jnp.asarray(data["encoder"]["counts"], jnp.float32)
    gyro = jnp.asarray(data["imu"]["angular_velocity"], jnp.float32)
    ranges = jnp.asarray(data["lidar"]["ranges"], jnp.float32)

    from lidar_slam_tpu.config import LidarConfig
    points, masks = scan_ops.scans_to_points(ranges, 0.1, 30.0,
                                             LidarConfig(n_rays=541))
    poses = odometry.poses_from_odometry(counts, gyro)
    sm = scan_matching.poses_from_scan_matching(poses, points, masks,
                                                IcpConfig(epsilon=0.001),
                                                chunk_size=16)
    K = occupancy.max_ray_cells(cfg.map, 30.0)
    grid = occupancy.build_logodds(sm.poses, points, masks, cfg.map, K)
    return {
        "poses_odom": np.asarray(poses),
        "poses_sm": np.asarray(sm.poses),
        "iters": np.asarray(sm.iters),
        "logodds": np.asarray(grid),
    }


def main():
    import json
    import subprocess

    results = {}
    for platform in ("cpu", "axon"):
        code = (
            "import sys; sys.path.insert(0, '.');"
            "import numpy as np;"
            f"from tools.tpu_parity_check import run_backend;"
            f"r = run_backend('{platform}');"
            "np.savez('/tmp/parity_%s.npz' % '" + platform + "', **r)"
        )
        subprocess.run([sys.executable, "-c", code], check=True)
        results[platform] = dict(np.load(f"/tmp/parity_{platform}.npz"))

    cpu, tpu = results["cpu"], results["axon"]
    report = {}
    report["odom_max_diff"] = float(np.abs(cpu["poses_odom"] - tpu["poses_odom"]).max())
    report["sm_max_diff"] = float(np.abs(cpu["poses_sm"] - tpu["poses_sm"]).max())
    report["icp_iters_equal_frac"] = float((cpu["iters"] == tpu["iters"]).mean())
    report["logodds_max_diff"] = float(np.abs(cpu["logodds"] - tpu["logodds"]).max())
    report["logodds_cells_equal_frac"] = float(
        (np.abs(cpu["logodds"] - tpu["logodds"]) < 1e-3).mean())
    print(json.dumps(report, indent=2))
    ok = (report["odom_max_diff"] < 1e-3 and report["sm_max_diff"] < 0.05
          and report["logodds_cells_equal_frac"] > 0.99)
    print("PARITY", "OK" if ok else "DEVIATION — inspect report")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
