"""Masked, batched Kabsch rigid alignment (SVD with reflection guard).

Capability parity with the reference's per-pair Kabsch fit
(reference: modules/icp.py:43-74), generalized to weights/masks and leading
batch dimensions so thousands of scan pairs solve in one batched 3x3 SVD —
the shape XLA handles well on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.precision import einsum as p_einsum, matmul as p_matmul


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
    S = p_einsum("...nd,...ne->...de", X, Y)  # (..., D, D)

    U, _, Vt = jnp.linalg.svd(S)
    V = jnp.swapaxes(Vt, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    det = jnp.linalg.det(p_matmul(V, Ut))
    corr = jnp.concatenate(
        [jnp.ones(det.shape + (D - 1,), dtype=src.dtype), det[..., None]], axis=-1
    )
    R = p_matmul(V * corr[..., None, :], Ut)
    t = ct - p_einsum("...de,...e->...d", R, cs)

    T = jnp.zeros(src.shape[:-2] + (D + 1, D + 1), dtype=src.dtype)
    T = T.at[..., :D, :D].set(R)
    T = T.at[..., :D, D].set(t)
    T = T.at[..., D, D].set(1.0)
    return T


def kabsch_planar(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    w: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Closed-form planar Kabsch: (..., N, 2) clouds -> (..., 4, 4) SE(3)
    transforms rotating about z only.

    For z = 0 clouds (the whole 2-D SLAM pipeline: the reference lifts scans
    to 3-D with zero z, modules/icp.py:153-156), the 3x3 cross-covariance is
    rank-deficient — XLA's iterative TPU SVD stalls on it (observed ~10^4 x
    slowdowns). The in-plane optimum is closed-form:
    theta* = atan2(S01 - S10, S00 + S11), identical to the SVD + det-guard
    result on planar data, with zero iterative work.
    """
    if w is None:
        w = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = w.astype(src.dtype)

    cs = masked_centroid(src, w)
    ct = masked_centroid(tgt, w)
    X = (src - cs[..., None, :]) * w[..., None]
    Y = tgt - ct[..., None, :]
    S = p_einsum("...nd,...ne->...de", X, Y)  # (..., 2, 2)

    theta = jnp.arctan2(S[..., 0, 1] - S[..., 1, 0],
                        S[..., 0, 0] + S[..., 1, 1])
    c, s = jnp.cos(theta), jnp.sin(theta)
    tx = ct[..., 0] - (c * cs[..., 0] - s * cs[..., 1])
    ty = ct[..., 1] - (s * cs[..., 0] + c * cs[..., 1])

    batch = src.shape[:-2]
    T = jnp.broadcast_to(jnp.eye(4, dtype=src.dtype), batch + (4, 4))
    T = T.at[..., 0, 0].set(c)
    T = T.at[..., 0, 1].set(-s)
    T = T.at[..., 1, 0].set(s)
    T = T.at[..., 1, 1].set(c)
    T = T.at[..., 0, 3].set(tx)
    T = T.at[..., 1, 3].set(ty)
    return T
