import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_slam_tpu.ops.nn import nearest_neighbors
from lidar_slam_tpu.ops.pallas_nn import nearest_neighbors_pallas

INTERPRET = jax.default_backend() != "tpu"

# the packed-key argmin truncates distance comparisons to 13 mantissa bits
# (ops/pallas_nn.py module docstring): indices may differ from the exact
# jnp path only when the two candidates' true distances are within this
# relative factor of each other
_TRUNC_REL = 2.0 ** -12


def _assert_nn_contract(src, tgt, got, want, tgt_mask=None):
    """Exact index match, except documented near-tie flips whose chosen
    neighbor is within the truncation factor of the optimal distance."""
    src, tgt = np.asarray(src), np.asarray(tgt)
    got, want = np.asarray(got), np.asarray(want)
    flips = got != want
    if flips.any():
        mw = np.take_along_axis(tgt, want[..., None], axis=-2)
        mg = np.take_along_axis(tgt, got[..., None], axis=-2)
        d_want = ((src - mw) ** 2).sum(-1)
        d_got = ((src - mg) ** 2).sum(-1)
        rel = np.abs(d_got - d_want) / np.maximum(d_want, 1e-12)
        assert rel[flips].max() <= 4 * _TRUNC_REL, (
            f"non-near-tie index flips: worst rel gap {rel[flips].max():.2e}")
    if tgt_mask is not None:
        m = np.asarray(tgt_mask)
        for b in range(got.shape[0]):
            assert m[b][got[b]].all()


def test_pallas_nn_matches_jnp():
    rng = np.random.default_rng(0)
    B, N, M = 3, 200, 150
    src = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32)
    got = nearest_neighbors_pallas(src, tgt, interpret=INTERPRET)
    want = nearest_neighbors(src, tgt)
    _assert_nn_contract(src, tgt, got, want)


def test_pallas_nn_respects_mask():
    rng = np.random.default_rng(1)
    B, N, M = 2, 130, 257
    src = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32)
    mask = jnp.asarray(rng.random((B, M)) > 0.4)
    got = nearest_neighbors_pallas(src, tgt, mask, interpret=INTERPRET)
    want = nearest_neighbors(src, tgt, mask)
    _assert_nn_contract(src, tgt, got, want, mask)


def test_pallas_nn_2d_points():
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.normal(size=(1, 64, 2)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(1, 90, 2)), jnp.float32)
    got = nearest_neighbors_pallas(src, tgt, interpret=INTERPRET)
    want = nearest_neighbors(src, tgt)
    _assert_nn_contract(src, tgt, got, want)


def test_pallas_nn_exact_tie_lowest_index():
    """Bit-identical duplicate targets must resolve to the LOWEST index
    (reference numpy argmin tie-break, modules/icp.py:40) — guaranteed by
    the packed key's index-in-low-bits construction."""
    src = jnp.asarray([[[0.5, 0.5, 0.0]]], jnp.float32)  # (1, 1, 3)
    dup = [0.5, 0.6, 0.0]
    tgt = jnp.asarray([[[9, 9, 9], dup, [3, 3, 3], dup, dup]], jnp.float32)
    got = np.asarray(nearest_neighbors_pallas(src, tgt, interpret=INTERPRET))
    assert got[0, 0] == 1


def test_pallas_nn_matched_points_equal_gather():
    """return_matched must reproduce tgt[idx] bit-for-bit (one-hot MXU
    pass contract)."""
    rng = np.random.default_rng(3)
    B, N, M = 2, 100, 170
    src = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32)
    mask = jnp.asarray(rng.random((B, M)) > 0.2)
    idx, matched = nearest_neighbors_pallas(src, tgt, mask,
                                            interpret=INTERPRET,
                                            return_matched=True)
    want = np.take_along_axis(np.asarray(tgt), np.asarray(idx)[..., None],
                              axis=-2)
    np.testing.assert_array_equal(np.asarray(matched), want)
