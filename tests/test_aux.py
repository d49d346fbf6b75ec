import io as std_io

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_slam_tpu.utils.logging import StageLogger
from lidar_slam_tpu.utils import profiling


def test_stage_logger_collects_metrics():
    buf = std_io.StringIO()
    log = StageLogger(stream=buf)
    log.start("Estimating poses")
    log.metric("n_poses", 100)
    dt = log.end()
    assert dt >= 0
    summary = log.summary()
    assert summary["Estimating poses.n_poses"] == 100
    assert "Estimating poses.seconds" in summary
    out = buf.getvalue()
    assert "Estimating poses..." in out and "=" * 52 in out


def test_stage_logger_json_lines():
    buf = std_io.StringIO()
    log = StageLogger(stream=buf, json_lines=True)
    log.start("s")
    log.metric("x", 1.5)
    log.end()
    log.summary()
    assert '"metric": "s.x"' in buf.getvalue()


def test_device_timer_counters():
    counters = {}
    with profiling.device_timer("op", counters, items=10, verbose=False):
        profiling.block(jnp.arange(8).sum())
    assert counters["op"] > 0
    assert counters["op_per_s"] > 0


def test_debug_mode_raises_on_nan():
    with profiling.debug_mode():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    # restored afterwards: no raise
    _ = jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()


def test_tic_toc(capsys):
    t = profiling.tic()
    dt = profiling.toc(t, "X")
    assert dt >= 0
    assert "X took" in capsys.readouterr().out


def test_devices_or_die_returns_devices():
    from lidar_slam_tpu.utils.profiling import devices_or_die

    devs = devices_or_die(timeout_s=60.0)
    assert len(devs) >= 1


def test_devices_or_die_kills_hung_backend_init():
    """A hung jax.devices() (dead TPU tunnel) must exit(3) with a diagnosis
    instead of blocking forever. Simulated in a subprocess with a patched
    never-returning jax.devices and a short watchdog timeout."""
    import subprocess
    import sys

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "import time; jax.devices = lambda *a: time.sleep(3600);"
        "from lidar_slam_tpu.utils.profiling import devices_or_die;"
        "devices_or_die(timeout_s=1.0); print('unreachable')"
    ) % repo
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert res.returncode == 3
    assert "FATAL" in res.stderr
    assert "unreachable" not in res.stdout


def test_bench_tunnel_wait_skips_off_axon(monkeypatch):
    """bench._wait_for_tunnel must return immediately (no subprocess
    probes) when the session is not on the axon tunnel platform."""
    import importlib.util
    import os
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(repo, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    t0 = time.time()
    assert bench._wait_for_tunnel() is True
    assert time.time() - t0 < 1.0
