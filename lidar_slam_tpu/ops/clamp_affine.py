"""Clamp-affine composition: the occupancy map's per-scan update is an
associative operation over SCANS.

The reference's map build is sequential in time because of the per-scan
clip (reference: modules/ogm.py:188 — after each scan's +/-log4 scatter
the whole grid is clipped to +/-20). Per cell, one scan's update is

    v  ->  clamp(v + d, -c, +c)

with d = that scan's summed +/-log4 contributions to the cell and
c = logodds_clip. This is a slope-1 clamp-affine function of v, and the
family  f(v) = clamp(v + a, lo, hi)  is CLOSED under composition:

    (f2 . f1)(v) = clamp(clamp(v + a1, lo1, hi1) + a2, lo2, hi2)
                 = clamp(v + (a1 + a2),
                         clamp(lo1 + a2, lo2, hi2),
                         clamp(hi1 + a2, lo2, hi2))

so the whole N-scan build is an associative product of N per-scan
functions — each represented by THREE grids (a, lo, hi) — and the final
map is F(v0) = clamp(v0 + a, lo, hi). This is what lets the multi-chip
path shard SCANS (the long axis) instead of rays: each device composes
its contiguous scan block locally, and blocks merge with log2(D)
elementwise composes after a single all_gather — no per-scan collective
(see parallel/sharding.sharded_build_logodds_scans).

Exactness: identical to the sequential reference semantics in exact
arithmetic. In f32 the result is BIT-IDENTICAL to the sequential build
whenever the running cell value never touches the +/-c rails (then
`a` accumulates the same adds in the same order and lo/hi never bind),
and whenever all quantities are exactly representable (e.g. integer
deltas — tested). A cell that saturates can differ by a few ULPs of the
rail value: the sequential path computes clamp(v)+d where the composed
path computes the algebraically equal (but differently rounded)
rail-plus-suffix chain. The deviation is bounded by one rounding error
per binding clip event and cannot compound past the rails (lo/hi stay in
[-c, c]). The ray-sharded path already accepts same-order reassociation
(psum) at ~1e-4 tolerance; this path is tested to the same bound.

The identity element on the invariant domain [-c, c] is (0, -c, +c):
clamp(v + 0, -c, +c) = v for any already-clipped v (the grid starts at 0
and every subsequent value is a clamp output, so the domain invariant
holds everywhere in the pipeline).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ClampAffine(NamedTuple):
    """f(v) = clamp(v + a, lo, hi), elementwise over grids."""

    a: jnp.ndarray
    lo: jnp.ndarray
    hi: jnp.ndarray


def identity(shape, clip: float, dtype=jnp.float32) -> ClampAffine:
    """The identity function on the invariant domain [-clip, clip]."""
    return ClampAffine(
        a=jnp.zeros(shape, dtype),
        lo=jnp.full(shape, -clip, dtype),
        hi=jnp.full(shape, clip, dtype),
    )


def update(f: ClampAffine, delta: jnp.ndarray, clip: float) -> ClampAffine:
    """Compose one per-scan update clamp(. + delta, -clip, clip) AFTER f.

    The special case of compose() for g = (delta, -clip, clip); used by the
    per-device sequential pass so each scan costs ~4 elementwise ops.
    """
    return ClampAffine(
        a=f.a + delta,
        lo=jnp.clip(f.lo + delta, -clip, clip),
        hi=jnp.clip(f.hi + delta, -clip, clip),
    )


def compose(f1: ClampAffine, f2: ClampAffine) -> ClampAffine:
    """The function f2 AFTER f1 (apply f1 first). Associative."""
    return ClampAffine(
        a=f1.a + f2.a,
        lo=jnp.clip(f1.lo + f2.a, f2.lo, f2.hi),
        hi=jnp.clip(f1.hi + f2.a, f2.lo, f2.hi),
    )


def apply(f: ClampAffine, v0: jnp.ndarray) -> jnp.ndarray:
    """Evaluate F(v0)."""
    return jnp.clip(v0 + f.a, f.lo, f.hi)


def compose_tree(fs: list[ClampAffine]) -> ClampAffine:
    """Compose an ordered list (fs[0] applied first) in log2(len) depth."""
    while len(fs) > 1:
        nxt = [compose(fs[i], fs[i + 1]) for i in range(0, len(fs) - 1, 2)]
        if len(fs) % 2:
            nxt.append(fs[-1])
        fs = nxt
    return fs[0]
