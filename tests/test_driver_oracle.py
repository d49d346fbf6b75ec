"""Driver-level end-to-end oracle: run the REFERENCE main.py and OUR main.py
as subprocesses on the same fabricated on-disk dataset and compare the saved
outputs/*.npy artifacts (names and contents).

Covers the driver seam the stage-wise oracle tests don't: load -> sync ->
(filters) -> odometry -> scan matching -> artifact naming
(reference: main.py:67-139). gtsam mode needs the uninstalled gtsam
binding, so odom and scan_matching modes are exercised (the pose-graph
stage itself is covered by tests/test_pose_graph.py and the reference-
oracle suite). The reference imports gtsam at module top level even for
odom mode, so the subprocess gets a stub module on PYTHONPATH.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def _write_dataset(data_dir, n_steps=40, n_rays=181, seed=7,
                   dataset_num=20, n_rgb=None):
    """n_rays=181 exercises the data-derived angle grid; the filtered
    variant needs full 1081-ray density (DBSCAN eps=0.1 empties sparser
    scans and the reference then NaNs — see CLAUDE.md)."""
    """Fabricate a dataset in the reference's on-disk npz schema
    (reference loader: modules/utils.py:36-102 — arrays stored
    sensor-major, transposed to time-major on load). dataset_num=21
    uses the 21-shaped generator (different extents, range_max=60)."""
    sys.path.insert(0, REPO)
    from lidar_slam_tpu.utils import io

    kw = {} if n_rgb is None else {"n_rgb": n_rgb}
    if dataset_num == 21:
        d = io.synthetic_dataset_21(n_steps=n_steps, n_rays=n_rays,
                                    seed=seed, **kw)
    else:
        d = io.synthetic_dataset(n_steps=n_steps, n_rays=n_rays, seed=seed,
                                 **kw)
    os.makedirs(data_dir, exist_ok=True)
    np.savez(os.path.join(data_dir, f"Encoders{dataset_num}.npz"),
             counts=d["encoder"]["counts"].T,
             time_stamps=d["encoder"]["stamps"])
    np.savez(os.path.join(data_dir, f"Hokuyo{dataset_num}.npz"),
             angle_min=np.asarray(d["lidar"]["angle_min"]),
             angle_max=np.asarray(d["lidar"]["angle_max"]),
             angle_increment=np.asarray([[d["lidar"]["angle_increment"]]]),
             range_min=np.asarray(d["lidar"]["range_min"]),
             range_max=np.asarray(d["lidar"]["range_max"]),
             ranges=d["lidar"]["ranges"].T,
             time_stamps=d["lidar"]["stamps"])
    np.savez(os.path.join(data_dir, f"Imu{dataset_num}.npz"),
             angular_velocity=d["imu"]["angular_velocity"].T,
             linear_acceleration=d["imu"]["linear_acceleration"].T,
             time_stamps=d["imu"]["stamps"])
    np.savez(os.path.join(data_dir, f"Kinect{dataset_num}.npz"),
             disparity_time_stamps=d["rgbd"]["disp_stamps"],
             rgb_time_stamps=d["rgbd"]["rgb_stamps"])


def _run_reference(run_dir, data_dir, mode, filter_lidar):
    stub_dir = os.path.join(run_dir, "_stubs")
    os.makedirs(stub_dir, exist_ok=True)
    with open(os.path.join(stub_dir, "gtsam.py"), "w") as f:
        f.write("# import stub: reference main.py imports gtsam at top "
                "level even in odom/scan_matching modes\n")
    os.makedirs(os.path.join(run_dir, "outputs"), exist_ok=True)
    os.makedirs(os.path.join(run_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(run_dir, "images_filtered"), exist_ok=True)
    args = ["--mode", mode, "--dataset_path", data_dir]
    if filter_lidar:
        args.append("--filter_lidar")
    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + stub_dir
    env["MPLBACKEND"] = "Agg"
    code = ("import sys; sys.argv = ['main.py'] + %r; "
            "exec(open(%r).read())" % (args, os.path.join(REF, "main.py")))
    return subprocess.run([sys.executable, "-c", code], cwd=run_dir,
                          capture_output=True, text=True, env=env,
                          timeout=900)


def _run_ours(run_dir, data_dir, mode, filter_lidar):
    os.makedirs(run_dir, exist_ok=True)
    args = ["--mode", mode, "--dataset_path", data_dir,
            "--output_dir", os.path.join(run_dir, "outputs")]
    if filter_lidar:
        args.append("--filter_lidar")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    code = ("import jax; jax.config.update('jax_platforms','cpu'); "
            "import sys; sys.argv = ['main.py'] + %r; "
            "exec(open(%r).read())" % (args, os.path.join(REPO, "main.py")))
    return subprocess.run([sys.executable, "-c", code], cwd=run_dir,
                          capture_output=True, text=True, env=env,
                          timeout=900)


@pytest.mark.slow
@pytest.mark.parametrize("mode,filter_lidar", [
    ("odom", False),
    ("scan_matching", False),
    ("scan_matching", True),
])
def test_driver_outputs_match_reference(tmp_path, mode, filter_lidar):
    data_dir = str(tmp_path / "data")
    if filter_lidar:
        _write_dataset(data_dir, n_steps=30, n_rays=1081)
    else:
        _write_dataset(data_dir)

    ref_dir = str(tmp_path / "ref_run")
    our_dir = str(tmp_path / "our_run")
    r_ref = _run_reference(ref_dir, data_dir, mode, filter_lidar)
    assert r_ref.returncode == 0, r_ref.stderr[-3000:]
    r_our = _run_ours(our_dir, data_dir, mode, filter_lidar)
    assert r_our.returncode == 0, r_our.stderr[-3000:]

    ref_files = sorted(os.listdir(os.path.join(ref_dir, "outputs")))
    our_files = sorted(os.listdir(os.path.join(our_dir, "outputs")))
    assert ref_files == our_files, (ref_files, our_files)
    assert f"poses_odom_20.npy" in ref_files

    for name in ref_files:
        want = np.load(os.path.join(ref_dir, "outputs", name))
        got = np.load(os.path.join(our_dir, "outputs", name))
        assert want.shape == got.shape, name
        # odometry is deterministic to f32 rounding; ICP-refined stages
        # accumulate f32-vs-f64 differences along the 39-pair chain
        atol = 1e-5 if "odom" in name else 5e-4
        np.testing.assert_allclose(got, want, atol=atol, err_msg=name)
