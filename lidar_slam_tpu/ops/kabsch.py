"""Masked, batched Kabsch rigid alignment (SVD with reflection guard).

Capability parity with the reference's per-pair Kabsch fit
(reference: modules/icp.py:43-74), generalized to weights/masks and leading
batch dimensions so thousands of scan pairs solve in one batched 3x3 SVD —
the shape XLA handles well on TPU.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def masked_centroid(pts: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted centroid over the points axis. pts (..., N, D), w (..., N)."""
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    return jnp.sum(pts * w[..., None], axis=-2) / wsum


def kabsch(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    w: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Rigid transform T (D+1, D+1) minimizing sum w_i ||R src_i + t - tgt_i||^2.

    src/tgt (..., N, D); w (..., N) weights (bool masks work). The returned
    rotation has det(R) = +1 via the diag(1, .., det) correction
    (reference: modules/icp.py:62-67).
    """
    D = src.shape[-1]
    if w is None:
        w = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = w.astype(src.dtype)

    cs = masked_centroid(src, w)
    ct = masked_centroid(tgt, w)
    X = (src - cs[..., None, :]) * w[..., None]
    Y = tgt - ct[..., None, :]
    S = jnp.einsum("...nd,...ne->...de", X, Y)  # (..., D, D)

    U, _, Vt = jnp.linalg.svd(S)
    V = jnp.swapaxes(Vt, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    det = jnp.linalg.det(V @ Ut)
    corr = jnp.concatenate(
        [jnp.ones(det.shape + (D - 1,), dtype=src.dtype), det[..., None]], axis=-1
    )
    R = (V * corr[..., None, :]) @ Ut
    t = ct - jnp.einsum("...de,...e->...d", R, cs)

    T = jnp.zeros(src.shape[:-2] + (D + 1, D + 1), dtype=src.dtype)
    T = T.at[..., :D, :D].set(R)
    T = T.at[..., :D, D].set(t)
    T = T.at[..., D, D].set(1.0)
    return T
