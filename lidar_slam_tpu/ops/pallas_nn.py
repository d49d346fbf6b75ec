"""Pallas TPU kernel: brute-force nearest-neighbor correspondence.

The ICP inner loop's hot op (SURVEY.md section 2 #9). The jnp path
(ops/nn.py) materializes the (B, N, M) distance tensor in HBM; this kernel
tiles (batch, source) blocks over the grid and keeps each (TN, Mp) distance
tile in VMEM only — one MXU pass (src_tile @ tgt^T) fused with the row
argmin per batch lane, so HBM traffic is just points in, indices out.

The row argmin is a PACKED-KEY min: distances are clamped non-negative,
bit-cast to int32 (order-preserving for non-negative floats), the low 11
mantissa bits are replaced by the target lane index, and a plain integer
min-reduce yields both winner and index in one pass. An index-tracking
argmin on (TN, Mp) costs ~4x more VPU work than a bare min; the packing
trades that for distance comparisons truncated to 13 mantissa bits:
  - ties after truncation resolve to the LOWEST index (reference numpy
    argmin tie-break, modules/icp.py:40);
  - targets whose true distances differ by less than ~2^-12 relative may
    resolve to either index (the chosen neighbor's distance is within
    that factor of optimal). bench.py gates every TPU run on this
    distance-gap contract.

Layout: coordinates padded to 8 sublanes; target axis padded to a multiple
of 128 lanes; the int32 output is tiled (8 batches x TN sources) to satisfy
TPU (8, 128) tiling. Masked/padded targets carry a +BIG additive term so
they never win the min (same contract as ops/nn.py).
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


def _packed_min(s, tt, t2m, idx_bits):
    """Distance row block + packed-key argmin for one batch lane.

    s (TN, 8) source coords, tt (8, Mp) transposed targets, t2m (1, Mp)
    masked |t|^2. Returns (key_tile, kmin) where key_tile is the packed
    (TN, Mp) int32 keys and kmin their row minima (TN, 1)."""
    d = t2m - 2.0 * jax.lax.dot(
        s, tt, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    # add |s|^2 per row and clamp: non-negative floats bit-cast to int32
    # preserve order (cancellation can give tiny negatives)
    s2 = jnp.sum(s * s, axis=-1, keepdims=True)
    d = jnp.maximum(d + s2, 0.0)
    m_iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    key = (jax.lax.bitcast_convert_type(d, jnp.int32)
           & ~jnp.int32((1 << idx_bits) - 1)) | m_iota
    return key, jnp.min(key, axis=-1, keepdims=True)


def _nn_kernel(src_ref, tgt_t_ref, t2m_ref, out_ref, *, idx_bits):
    mask = (1 << idx_bits) - 1
    for b in range(_TB):  # static unroll over the batch tile
        _, kmin = _packed_min(src_ref[b], tgt_t_ref[b], t2m_ref[b], idx_bits)
        out_ref[b, :] = (kmin & mask)[:, 0]


def _nn_matched_kernel(src_ref, tgt_t_ref, t2m_ref, out_ref, out_m_ref, *,
                       idx_bits):
    mask = (1 << idx_bits) - 1
    for b in range(_TB):
        key, kmin = _packed_min(src_ref[b], tgt_t_ref[b], t2m_ref[b],
                                idx_bits)
        out_ref[b, :] = (kmin & mask)[:, 0]
        # matched coordinates via a one-hot MXU pass: packed keys are
        # unique per lane, so exactly one nonzero term per row and the
        # result equals tgt[idx] bit-for-bit — no HBM gather
        # (take_along_axis is the slow op in the ICP inner loop)
        onehot = (key == kmin).astype(jnp.float32)
        out_m_ref[b] = jax.lax.dot_general(
            tgt_t_ref[b], onehot, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (8, TN)


@partial(jax.jit, static_argnames=("tile_n", "interpret", "return_matched"))
def nearest_neighbors_pallas(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray | None = None,
    tile_n: int | None = None,
    interpret: bool = False,
    return_matched: bool = False,
):
    """Masked NN indices: src (B, N, D), tgt (B, M, D) -> (B, N) int32.

    Semantics match ops/nn.nearest_neighbors (lowest-index ties) up to the
    packed-key truncation documented in the module docstring: targets
    within ~2^-12 relative distance of each other may resolve to either
    index (bench.py gates on the chosen-neighbor distance gap); above
    M = 2048 the index field widens to 12 bits and the truncation factor
    coarsens to ~2^-11. Identical behavior compiled and in interpreter
    mode. Requires M <= 4096; larger targets should use the jnp path or a
    chunked reduction. Fits (tile_n, Mp) in VMEM: suitable for M up to a
    few thousand points (the scan-matching regime).

    With return_matched=True also returns tgt[idx] as (B, N, D), computed
    in-kernel by a one-hot MXU pass (bit-identical to the gather, but
    avoids take_along_axis — the dominant latency in the ICP inner loop).
    """
    B, N, D = src.shape
    M = tgt.shape[1]
    Bp = _round_up(B, _TB)
    Mp = _round_up(M, 128)
    if tile_n is None:
        # whole source axis per grid step: fewer, bigger steps measurably
        # beat small tiles (per-grid-step overhead dominates tiny kernels).
        # Capped so the two (tile_n, Mp) key/distance intermediates stay
        # within a ~12 MiB VMEM budget: at Mp well beyond the scan regime
        # (e.g. the documented M <= 4096 ceiling) an uncapped whole-source
        # tile would need ~2x VMEM and fail to compile.
        cap = (12 * 1024 * 1024 // (8 * Mp)) // 128 * 128
        tile_n = min(_round_up(N, 128), max(128, cap))
    Np = _round_up(N, tile_n)
    idx_bits = 11 if Mp <= (1 << 11) else 12
    if Mp > (1 << idx_bits):
        raise ValueError(
            f"target axis {M} exceeds the packed-key index field "
            f"({1 << idx_bits}); use the jnp path")
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
            partial(_nn_kernel, idx_bits=idx_bits),
            out_shape=jax.ShapeDtypeStruct((Bp, Np), jnp.int32),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((_TB, tile_n), lambda b, i: (b, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(srcp, tgt_t, t2m)
        return out[:B, :N]

    out, matched_t = pl.pallas_call(
        partial(_nn_matched_kernel, idx_bits=idx_bits),
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
