import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # the axon sitecustomize pins the TPU platform at interpreter startup,
    # so the subprocess must re-select cpu via jax.config (see conftest)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ['main.py'] + %r;"
        "exec(open(%r).read())" % (args, os.path.join(REPO, "main.py"))
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
