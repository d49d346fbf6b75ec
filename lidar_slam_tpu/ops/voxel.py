"""Voxel-grid downsampling.

Capability parity with the reference's voxel_downsample
(reference: modules/icp.py:4-27, used by the ICP warm-up
code/icp_warm_up/test_icp.py:75-82): points are binned by
floor((p - min) / voxel) and each occupied voxel is replaced by the mean of
its points, ordered by lexicographically sorted voxel index (np.unique
order).

Two implementations:
  - `voxel_downsample`: host numpy, variable-size output (preprocessing at
    the data boundary, like the reference);
  - `voxel_downsample_masked`: device-side fixed-shape variant returning
    (max_voxels, D) + validity mask, built from sort + segment means — for
    keeping the whole warm-up pipeline on device.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def voxel_downsample(point_cloud: np.ndarray, voxel_size: float) -> np.ndarray:
    """Host-side exact equivalent of the reference routine."""
    pc = np.asarray(point_cloud)
    vox = np.floor((pc - pc.min(axis=0)) / voxel_size).astype(np.int64)
    uniq, inverse = np.unique(vox, axis=0, return_inverse=True)
    out = np.zeros((len(uniq), pc.shape[1]), dtype=pc.dtype)
    counts = np.bincount(inverse, minlength=len(uniq)).astype(pc.dtype)
    for d in range(pc.shape[1]):
        out[:, d] = np.bincount(inverse, weights=pc[:, d], minlength=len(uniq))
    return out / counts[:, None]


@partial(jax.jit, static_argnames=("max_voxels",))
def voxel_downsample_masked(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    voxel_size: float,
    max_voxels: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-shape voxel means on device.

    points (N, D), mask (N,) -> (max_voxels, D) means + (max_voxels,) valid.
    Voxels beyond max_voxels are dropped (choose max_voxels >= expected
    occupancy). Output order is sorted by linear voxel id.
    """
    N, D = points.shape
    big = jnp.asarray(jnp.inf, points.dtype)
    mn = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    vox = jnp.floor((points - mn) / voxel_size).astype(jnp.int64)
    span = 2_097_143  # prime > any realistic per-axis voxel count
    lin = vox[:, 0]
    for d in range(1, D):
        lin = lin * span + vox[:, d]
    lin = jnp.where(mask, lin, jnp.iinfo(jnp.int64).max)

    order = jnp.argsort(lin)
    lin_s = lin[order]
    pts_s = points[order]
    msk_s = mask[order]

    first = jnp.concatenate([jnp.ones(1, bool), lin_s[1:] != lin_s[:-1]])
    first = first & msk_s
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # voxel slot per point
    seg = jnp.where(msk_s, seg, max_voxels)  # masked points -> dropped

    sums = jnp.zeros((max_voxels + 1, D), points.dtype).at[seg].add(pts_s)
    cnts = jnp.zeros((max_voxels + 1,), points.dtype).at[seg].add(1.0)
    valid = cnts[:max_voxels] > 0
    means = sums[:max_voxels] / jnp.maximum(cnts[:max_voxels, None], 1.0)
    return means, valid
