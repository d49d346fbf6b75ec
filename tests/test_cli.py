import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd, script="main.py"):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # the axon sitecustomize pins the TPU platform at interpreter startup,
    # so the subprocess must re-select cpu via jax.config (see conftest)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = [%r] + %r;"
        "exec(open(%r).read())" % (script, args, os.path.join(REPO, script))
    )
    return subprocess.run([sys.executable, "-c", code], cwd=cwd,
                          capture_output=True, text=True, env=env,
                          timeout=600)


@pytest.mark.slow
def test_cli_odom_synthetic(tmp_path):
    r = _run(["--mode", "odom", "--synthetic", "50", "--res", "0.1",
              "--width", "30", "--height", "30", "--generate_texture_map",
              "--output_dir", str(tmp_path / "outputs")], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    poses = np.load(tmp_path / "outputs" / "poses_odom_20.npy")
    assert poses.shape == (50, 3)
    rel = np.load(tmp_path / "outputs" / "relative_poses_odom_20.npy")
    assert rel.shape == (49, 3, 3)
    assert (tmp_path / "images" / "logodds_map_odom_20.png").exists()
    assert "skipping texture" in r.stdout


@pytest.mark.slow
def test_cli_gtsam_filtered_synthetic(tmp_path):
    r = _run(["--mode", "gtsam", "--filter_lidar", "--synthetic", "40",
              "--res", "0.2", "--width", "30", "--height", "30",
              "--output_dir", str(tmp_path / "outputs")], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    for name in ["poses_odom_20", "poses_scan_matching_20", "poses_optimized_20",
                 "relative_poses_scan_matching_20"]:
        assert (tmp_path / "outputs" / f"{name}.npy").exists(), name
    assert "loop closures" in r.stdout


def test_cli_missing_dataset_errors(tmp_path):
    r = _run(["--dataset_path", "/nonexistent/"], cwd=str(tmp_path))
    assert r.returncode != 0
    assert "Data folder does not exist" in (r.stderr + r.stdout)


@pytest.mark.slow
def test_online_cli_synthetic_checkpoint_resume(tmp_path):
    """online_slam.py streams, checkpoints, and resumes; track covers
    step 0 (round-3 review)."""
    ck = str(tmp_path / "ck.npz")
    r = _run(["--synthetic", "40", "--res", "0.2", "--width", "16",
              "--height", "16", "--window", "24", "--checkpoint", ck,
              "--map_path", str(tmp_path / "m.png"),
              "--poses_path", str(tmp_path / "p.npy")],
             cwd=str(tmp_path), script="online_slam.py")
    assert r.returncode == 0, r.stderr[-2000:]
    track = np.load(tmp_path / "p.npy")
    assert track.shape == (40, 3)  # includes step 0
    assert (tmp_path / "m.png").exists()
    r2 = _run(["--synthetic", "40", "--res", "0.2", "--width", "16",
               "--height", "16", "--window", "24", "--checkpoint", ck,
               "--resume", "--map_path", str(tmp_path / "m2.png")],
              cwd=str(tmp_path), script="online_slam.py")
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed from" in r2.stderr


@pytest.mark.slow
def test_online_cli_dataset_mode(tmp_path):
    """The real-data branch of online_slam.py loads a fabricated on-disk
    dataset (round-3 review: load_data was called with the path in the
    dataset_names slot and crashed)."""
    from test_driver_oracle import _write_dataset

    data_dir = str(tmp_path / "data")
    _write_dataset(data_dir, n_steps=30, n_rays=181)
    r = _run(["--dataset", "20", "--dataset_path", data_dir,
              "--res", "0.2", "--width", "16", "--height", "16",
              "--map_path", str(tmp_path / "m.png")],
             cwd=str(tmp_path), script="online_slam.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "streamed" in r.stderr
    assert (tmp_path / "m.png").exists()


def test_online_cli_resume_refuses_missing_checkpoint(tmp_path):
    """--resume with a missing checkpoint must hard-error instead of
    silently starting fresh and overwriting the path at the end
    (round-3 review)."""
    r = _run(["--synthetic", "10", "--resume",
              "--checkpoint", str(tmp_path / "nope.npz")],
             cwd=str(tmp_path), script="online_slam.py")
    assert r.returncode != 0
    assert "does not exist" in r.stderr
    assert not (tmp_path / "nope.npz").exists()
    r2 = _run(["--synthetic", "10", "--resume"],
              cwd=str(tmp_path), script="online_slam.py")
    assert r2.returncode != 0
    assert "requires --checkpoint" in r2.stderr
