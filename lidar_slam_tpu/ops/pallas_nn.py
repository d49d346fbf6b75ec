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


@partial(jax.jit, static_argnames=("tile_n", "interpret"))
def nearest_neighbors_pallas(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray | None = None,
    tile_n: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact masked NN indices: src (B, N, D), tgt (B, M, D) -> (B, N) int32.

    Semantics identical to ops/nn.nearest_neighbors (lowest-index ties).
    Fits (tile_n, Mp) in VMEM: suitable for M up to a few thousand points
    (the scan-matching regime); larger targets should use the jnp path or a
    chunked reduction.
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
    out = pl.pallas_call(
        _nn_kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, Np), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TB, tile_n, 8), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 8, Mp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 1, Mp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TB, tile_n), lambda b, i: (b, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(srcp, tgt_t, t2m)
    return out[:B, :N]
