"""Pallas TPU kernel: brute-force nearest-neighbor correspondence.

The ICP inner loop's hot op (SURVEY.md section 2 #9). The jnp path
(ops/nn.py) materializes the (B, N, M) distance tensor in HBM; this kernel
tiles (batch, source) blocks over the grid and keeps each (TN, Mp) distance
tile in VMEM only — one MXU pass (src_tile @ tgt^T) fused with the row
argmin per batch lane, so HBM traffic is just points in, indices out.

Layout: coordinates padded to 8 sublanes; target axis padded to a multiple
of 128 lanes; the int32 output is tiled (8 batches x TN sources) to satisfy
TPU (8, 128) tiling. Masked/padded targets carry a +BIG additive term so
they never win the argmin (same contract as ops/nn.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
_TB = 8  # batch tile (sublane multiple for the int32 output)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _nn_kernel(src_ref, tgt_t_ref, t2m_ref, out_ref):
    for b in range(_TB):  # static unroll over the batch tile
        s = src_ref[b]  # (TN, 8)
        tt = tgt_t_ref[b]  # (8, Mp)
        # full-f32 MXU pass: bf16 default would perturb distances enough to
        # flip argmin winners vs the jnp reference path
        d = t2m_ref[b] - 2.0 * jax.lax.dot(
            s, tt, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        out_ref[b, :] = jnp.argmin(d, axis=-1).astype(jnp.int32)


def _nn_matched_kernel(src_ref, tgt_t_ref, t2m_ref, out_ref, out_m_ref):
    for b in range(_TB):
        s = src_ref[b]
        tt = tgt_t_ref[b]
        d = t2m_ref[b] - 2.0 * jax.lax.dot(
            s, tt, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
        out_ref[b, :] = idx
        # matched coordinates via a one-hot MXU pass: exactly one nonzero
        # term per row, so the result equals tgt[idx] bit-for-bit — and no
        # HBM gather (take_along_axis is the slow op in the ICP inner loop)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        onehot = (m_iota == idx[:, None]).astype(jnp.float32)
        out_m_ref[b] = jax.lax.dot_general(
            tt, onehot, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (8, TN)


@partial(jax.jit, static_argnames=("tile_n", "interpret", "return_matched"))
def nearest_neighbors_pallas(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray | None = None,
    tile_n: int = 256,
    interpret: bool = False,
    return_matched: bool = False,
):
    """Exact masked NN indices: src (B, N, D), tgt (B, M, D) -> (B, N) int32.

    Semantics match ops/nn.nearest_neighbors (lowest-index ties) up to
    floating NEAR-TIES: the compiled MXU contraction rounds distances
    differently from XLA's einsum lowering, so targets at float-equal
    distance can resolve to a different (equidistant) index (~0.05% of
    indices on real scans; bench.py gates on the chosen-neighbor distance
    gap). In interpreter mode the indices are bit-identical.
    Fits (tile_n, Mp) in VMEM: suitable for M up to a few thousand points
    (the scan-matching regime); larger targets should use the jnp path or a
    chunked reduction.

    With return_matched=True also returns tgt[idx] as (B, N, D), computed
    in-kernel by a one-hot MXU pass (bit-identical to the gather, but
    avoids take_along_axis — the dominant latency in the ICP inner loop).
    """
    B, N, D = src.shape
    M = tgt.shape[1]
    Bp = _round_up(B, _TB)
    Np = _round_up(N, tile_n)
    Mp = _round_up(M, 128)
    dtype = jnp.float32

    srcp = jnp.zeros((Bp, Np, 8), dtype).at[:B, :N, :D].set(src.astype(dtype))
    tgt_t = jnp.zeros((Bp, 8, Mp), dtype).at[:B, :D, :M].set(
        jnp.swapaxes(tgt.astype(dtype), -1, -2))

    t2 = jnp.sum(tgt.astype(dtype) ** 2, axis=-1)  # (B, M)
    if tgt_mask is not None:
        t2 = jnp.where(tgt_mask, t2, _BIG)
    t2m = jnp.full((Bp, 1, Mp), _BIG, dtype).at[:B, 0, :M].set(t2)

    grid = (Bp // _TB, Np // tile_n)
    in_specs = [
        pl.BlockSpec((_TB, tile_n, 8), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_TB, 8, Mp), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_TB, 1, Mp), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if not return_matched:
        out = pl.pallas_call(
            _nn_kernel,
            out_shape=jax.ShapeDtypeStruct((Bp, Np), jnp.int32),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((_TB, tile_n), lambda b, i: (b, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(srcp, tgt_t, t2m)
        return out[:B, :N]

    out, matched_t = pl.pallas_call(
        _nn_matched_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Np), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 8, Np), dtype),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((_TB, tile_n), lambda b, i: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 8, tile_n), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(srcp, tgt_t, t2m)
    matched = jnp.swapaxes(matched_t[:B, :D, :N], -1, -2)
    return out[:B, :N], matched
