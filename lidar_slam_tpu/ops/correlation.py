"""Map correlation: scan-to-map scoring over a grid of pose offsets.

Capability parity with the course-starter mapCorrelation
(reference: code/pr2_utils.py:12-43 — present upstream but unused by the
pipeline; kept for completeness and as the building block of
particle-filter-style localization). The reference double-loops over the
(xs, ys) offset grid in Python; here the whole (n_xs, n_ys, N-points)
evaluation is one vectorized gather-sum, and a batched variant scores many
scans/particles at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def map_correlation(
    im: jnp.ndarray,
    x_im: jnp.ndarray,
    y_im: jnp.ndarray,
    vp: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
) -> jnp.ndarray:
    """Sum of map values at scan endpoints over an offset grid.

    im (nx, ny) map; x_im/y_im physical cell coordinates; vp (2, N) world
    points; xs (n_xs,), ys (n_ys,) offsets. Returns (n_xs, n_ys).
    Rounding matches the reference exactly: round-half-to-even then int cast
    (reference: code/pr2_utils.py:36-39).
    """
    nx, ny = im.shape
    xmin, xmax = x_im[0], x_im[-1]
    ymin, ymax = y_im[0], y_im[-1]
    xres = (xmax - xmin) / (nx - 1)
    yres = (ymax - ymin) / (ny - 1)

    x1 = vp[0][None, :] + xs[:, None]  # (n_xs, N)
    y1 = vp[1][None, :] + ys[:, None]  # (n_ys, N)
    ix = jnp.round((x1 - xmin) / xres).astype(jnp.int32)
    iy = jnp.round((y1 - ymin) / yres).astype(jnp.int32)

    vx = (ix >= 0) & (ix < nx)  # (n_xs, N)
    vy = (iy >= 0) & (iy < ny)  # (n_ys, N)
    valid = vx[:, None, :] & vy[None, :, :]  # (n_xs, n_ys, N)

    ixc = jnp.clip(ix, 0, nx - 1)
    iyc = jnp.clip(iy, 0, ny - 1)
    vals = im[ixc[:, None, :], iyc[None, :, :]]  # (n_xs, n_ys, N)
    return jnp.sum(jnp.where(valid, vals.astype(jnp.float64 if
                                                im.dtype == jnp.float64
                                                else jnp.float32), 0.0),
                   axis=-1)


map_correlation_batch = jax.jit(jax.vmap(map_correlation,
                                         in_axes=(None, None, None, 0, None, None)))
"""Score a batch of scans/particles: vp (B, 2, N) -> (B, n_xs, n_ys)."""
