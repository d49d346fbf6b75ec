import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_slam_tpu.ops.nn import nearest_neighbors
from lidar_slam_tpu.ops.pallas_nn import nearest_neighbors_pallas

INTERPRET = jax.default_backend() != "tpu"


def test_pallas_nn_matches_jnp():
    rng = np.random.default_rng(0)
    B, N, M = 3, 200, 150
    src = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32)
    got = np.asarray(nearest_neighbors_pallas(src, tgt, interpret=INTERPRET))
    want = np.asarray(nearest_neighbors(src, tgt))
    np.testing.assert_array_equal(got, want)


def test_pallas_nn_respects_mask():
    rng = np.random.default_rng(1)
    B, N, M = 2, 130, 257
    src = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32)
    mask = jnp.asarray(rng.random((B, M)) > 0.4)
    got = np.asarray(nearest_neighbors_pallas(src, tgt, mask, interpret=INTERPRET))
    want = np.asarray(nearest_neighbors(src, tgt, mask))
    np.testing.assert_array_equal(got, want)
    # never selects a masked-out target
    m = np.asarray(mask)
    for b in range(B):
        assert m[b][got[b]].all()


def test_pallas_nn_2d_points():
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.normal(size=(1, 64, 2)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(1, 90, 2)), jnp.float32)
    got = np.asarray(nearest_neighbors_pallas(src, tgt, interpret=INTERPRET))
    want = np.asarray(nearest_neighbors(src, tgt))
    np.testing.assert_array_equal(got, want)
