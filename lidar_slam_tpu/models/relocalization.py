"""Global relocalization: multi-resolution correlative scan matching.

New surface (no reference analog — SURVEY.md lists mapCorrelation,
reference code/pr2_utils.py:12-43, as the course starter's intended
localization kernel; models/particle_filter.py completes the TRACKING
use, this module completes the GLOBAL one). Solves the kidnapped-robot
problem: given only an occupancy map and a single scan, find the robot
pose with no prior better than "somewhere in this window".

The classic solution is branch-and-bound over a max-pooled map pyramid
(Olson 2009; Cartographer's real-time loop closure). Best-first BnB is a
sequential, data-dependent tree walk — hostile to XLA. The TPU-first
restructuring here keeps the pyramid's admissible bound but replaces the
tree walk with a BATCHED coarse-to-fine beam plus a post-hoc exactness
certificate:

  - pyramid level k holds the sliding-window max of the hit map over
    2^k x 2^k cell windows (built in k doubling passes), so one gather-sum
    at level k upper-bounds the true score of EVERY leaf pose in the
    node's 2^k x 2^k translation block;
  - every level scores ALL its candidate nodes in one fixed-shape
    gather-sum over the subsampled scan (the particle-filter scoring
    shape, models/particle_filter._score_particles) and keeps the top
    `beam` nodes (lax.top_k). No data-dependent control flow anywhere;
  - instead of pruning-with-invariant, exactness is CERTIFIED after the
    fact: the best bound among nodes the beam dropped is recorded per
    level, and the returned leaf is provably the global optimum over the
    sampled pose grid iff no dropped bound exceeds its score
    (`certified`, with the margin in `pruned_margin`). If a run comes
    back uncertified, rerun with a larger beam.

The search grid is (n_angles yaw samples) x (every map cell in the
window); the certificate is exact over that grid, and the optional ICP
polish (`relocalize_refined`) recovers the sub-cell / sub-step remainder
against the occupied-cell centers, reusing ops/icp.py end to end.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import MapConfig
from ..models import occupancy
from ..ops import icp as icp_ops
from ..utils import se2


@dataclass(frozen=True)
class RelocConfig:
    """Global-relocalization search parameters (new surface).

    The pose grid searched is exact: `n_angles` yaw samples spanning
    `yaw_span` around `yaw_center`, times every grid cell within
    `search_radius` meters of the search center. `n_levels` sets the
    coarsest translation block (2^(n_levels-1) cells); `beam` is the
    node budget carried between levels; `max_rays` subsamples the scan
    with a static stride (scoring cost is linear in it).
    """

    n_angles: int = 360
    yaw_center: float = 0.0
    yaw_span: float = 2.0 * np.pi
    search_radius: float = 10.0
    n_levels: int = 5
    beam: int = 1024
    max_rays: int = 256
    score_chunk: int = 16384  # nodes scored per lax.map step (memory bound)
    # ICP-polish target window: occupied cells within (max masked scan
    # range + icp_margin) of the grid candidate. Scales with the scan
    # instead of the search window, so dataset-scale maps don't dilute
    # the fixed-size target subsample with far-away cells.
    icp_margin: float = 5.0


class RelocResult(NamedTuple):
    pose: jnp.ndarray           # (3,) best grid pose (cell/angle resolution)
    score: jnp.ndarray          # () true hit count of the best leaf
    certified: jnp.ndarray      # () bool: provably optimal over the grid
    pruned_margin: jnp.ndarray  # () score - max dropped bound (>= 0 iff certified)


def hit_map(logodds: jnp.ndarray) -> jnp.ndarray:
    """Occupancy hit map for correlative scoring: 1.0 where the log-odds
    grid says obstacle, 0.0 elsewhere (the particle filter's convention,
    models/particle_filter.py)."""
    return (logodds > 0).astype(jnp.float32)


def build_max_pyramid(im: jnp.ndarray, n_levels: int) -> List[jnp.ndarray]:
    """Sliding-window max pyramid: level k holds, at full resolution,
    max over the 2^k x 2^k window anchored low at each cell.

    pool[k][i, j] = max(im[i:i+2^k, j:j+2^k]) with out-of-range cells
    treated as 0. im must be non-negative for the zero padding to be an
    upper bound, so it is clamped here — passing raw log-odds instead of
    hit_map(logodds) degrades scores but can no longer invalidate the
    certificate. Built in k doubling passes of three shifted maxima, so
    the whole pyramid costs O(n_levels) cheap elementwise passes instead
    of one O(window^2) pool per level.
    """
    im = jnp.maximum(im, 0.0)
    levels = [im]
    m = im
    for k in range(n_levels - 1):
        s = 1 << k
        mi = jnp.pad(m, ((0, s), (0, 0)))[s:, :]
        mj = jnp.pad(m, ((0, 0), (0, s)))[:, s:]
        mij = jnp.pad(m, ((0, s), (0, s)))[s:, s:]
        m = jnp.maximum(jnp.maximum(m, mi), jnp.maximum(mj, mij))
        levels.append(m)
    return levels


@partial(jax.jit, static_argnames=("leaf", "chunk"))
def _score_nodes(pool: jnp.ndarray, base_i: jnp.ndarray, base_j: jnp.ndarray,
                 rmask: jnp.ndarray, ai: jnp.ndarray, oi: jnp.ndarray,
                 oj: jnp.ndarray, live: jnp.ndarray,
                 leaf: bool, chunk: int) -> jnp.ndarray:
    """Score a node list against one pyramid level.

    pool (W, H) level map; base_i/base_j (A, R) endpoint cells of the
    subsampled scan at the search-center translation for each yaw sample;
    rmask (R,) ray validity; ai/oi/oj (n,) node (angle, cell-offset)
    coordinates; live (n,) False for padding (scored -inf). Nodes are
    scored in `chunk`-sized slices under lax.map so peak memory is
    O(chunk * R) regardless of n.

    Non-leaf levels gather with CLIPPED indices and no bounds mask: for
    an out-of-window anchor the clipped pooled value still upper-bounds
    every in-bounds leaf below it (children sit within 2^k of the anchor,
    inside the window the clipped cell's pool covers), and fully
    out-of-bounds subtrees score >= their true 0. Leaf level applies the
    true out-of-bounds mask so the returned score is the exact hit count.
    """
    W, H = pool.shape
    n = ai.shape[0]
    pad = (-n) % chunk
    ai_c = jnp.pad(ai, (0, pad)).reshape(-1, chunk)
    oi_c = jnp.pad(oi, (0, pad)).reshape(-1, chunk)
    oj_c = jnp.pad(oj, (0, pad)).reshape(-1, chunk)

    def score_chunk(node):
        a, u, v = node
        gi = base_i[a] + u[:, None]          # (chunk, R)
        gj = base_j[a] + v[:, None]
        vals = pool[jnp.clip(gi, 0, W - 1), jnp.clip(gj, 0, H - 1)]
        ok = rmask[None, :]
        if leaf:
            ok = ok & (gi >= 0) & (gi < W) & (gj >= 0) & (gj < H)
        return jnp.sum(jnp.where(ok, vals, 0.0), axis=1)

    scores = jax.lax.map(score_chunk, (ai_c, oi_c, oj_c)).reshape(-1)[:n]
    return jnp.where(live, scores, -jnp.inf)


@partial(jax.jit, static_argnames=("k",))
def _keep_top(scores: jnp.ndarray, ai, oi, oj, k: int):
    """Beam select: top-k nodes plus the best DROPPED score (the
    certificate input; -inf when nothing is dropped)."""
    n = scores.shape[0]
    if n <= k:
        return scores, ai, oi, oj, jnp.float32(-jnp.inf)
    top, idx = jax.lax.top_k(scores, k + 1)
    pruned_max = top[k]
    keep = idx[:k]
    return top[:k], ai[keep], oi[keep], oj[keep], pruned_max


def _base_cells(pts: jnp.ndarray, mask: jnp.ndarray, center: jnp.ndarray,
                angles: np.ndarray, map_cfg: MapConfig,
                max_rays: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Endpoint cells of the (stride-subsampled) scan for every yaw sample,
    translated to the search center. Returns (A, R') i/j cells + (R',) mask."""
    R = pts.shape[0]
    stride = max(1, -(-R // max_rays))  # ceil div: static shapes
    p = pts[::stride]
    m = mask[::stride]
    th = jnp.asarray(angles, jnp.float32)
    c, s = jnp.cos(th)[:, None], jnp.sin(th)[:, None]
    xw = c * p[None, :, 0] - s * p[None, :, 1] + center[0]
    yw = s * p[None, :, 0] + c * p[None, :, 1] + center[1]
    gi, gj = occupancy.world2grid(xw, yw, map_cfg)
    return gi.astype(jnp.int32), gj.astype(jnp.int32), m


def relocalize(im: jnp.ndarray, map_cfg: MapConfig, pts: jnp.ndarray,
               mask: jnp.ndarray, cfg: RelocConfig = RelocConfig(),
               center: Tuple[float, float] = (0.0, 0.0),
               score_fn=None) -> RelocResult:
    """Find the scan's pose in the map by certified coarse-to-fine search.

    im (W, H) non-negative scoring map (hit_map(logodds)); pts (R, 2)
    robot-frame scan points; mask (R,) validity; center: search window
    center in world meters. The level loop is a short static Python loop
    (shapes per level are fixed by cfg), so the whole search compiles to
    ~3 programs regardless of map or window size. score_fn overrides the
    node scorer (same signature as _score_nodes — pass
    parallel.sharding.sharded_reloc_score(mesh) to shard the node axis
    over a device mesh, bit-identically).
    """
    score_nodes = _score_nodes if score_fn is None else score_fn
    angles = (cfg.yaw_center - cfg.yaw_span / 2.0
              + cfg.yaw_span * np.arange(cfg.n_angles) / cfg.n_angles)
    ctr = jnp.asarray(center, jnp.float32)
    base_i, base_j, rmask = _base_cells(pts, mask, ctr, angles, map_cfg,
                                        cfg.max_rays)
    pyramid = build_max_pyramid(im, cfg.n_levels)

    S = int(np.ceil(cfg.search_radius / map_cfg.resolution))
    kmax = cfg.n_levels - 1
    block = 1 << kmax
    T = -((-(2 * S + 1)) // block)
    us = np.arange(T, dtype=np.int32) * block - S
    a0, u0, v0 = np.meshgrid(np.arange(cfg.n_angles, dtype=np.int32), us, us,
                             indexing="ij")
    ai, oi, oj = (jnp.asarray(a0.ravel()), jnp.asarray(u0.ravel()),
                  jnp.asarray(v0.ravel()))
    live = jnp.ones(ai.shape, bool)

    pruned = []
    for k in range(kmax, -1, -1):
        scores = score_nodes(pyramid[k], base_i, base_j, rmask, ai, oi, oj,
                             live, leaf=(k == 0), chunk=cfg.score_chunk)
        if k == 0:
            break
        scores, ai, oi, oj, pmax = _keep_top(scores, ai, oi, oj, cfg.beam)
        pruned.append(pmax)
        s = 1 << (k - 1)
        n = ai.shape[0]
        ai = jnp.tile(ai, 4)
        di = jnp.repeat(jnp.asarray([0, s, 0, s], jnp.int32), n)
        dj = jnp.repeat(jnp.asarray([0, 0, s, s], jnp.int32), n)
        oi = jnp.tile(oi, 4) + di
        oj = jnp.tile(oj, 4) + dj
        # The block tiling rounds the window up to a multiple of the
        # coarsest block, so leaves can sit up to one block past the
        # requested radius — the window is covered, never truncated.
        live = jnp.tile(jnp.isfinite(scores), 4)

    best = jnp.argmax(scores)
    s_star = scores[best]
    res = jnp.float32(map_cfg.resolution)
    pose = jnp.stack([ctr[0] + oi[best].astype(jnp.float32) * res,
                      ctr[1] + oj[best].astype(jnp.float32) * res,
                      jnp.asarray(angles, jnp.float32)[ai[best]]])
    pruned_max = (jnp.stack(pruned).max() if pruned
                  else jnp.float32(-jnp.inf))
    return RelocResult(pose=pose, score=s_star,
                       certified=pruned_max <= s_star,
                       pruned_margin=s_star - pruned_max)


def occupied_points(logodds: np.ndarray, map_cfg: MapConfig,
                    max_pts: int = 4096,
                    center: Tuple[float, float] | None = None,
                    radius: float | None = None) -> Tuple[np.ndarray, np.ndarray]:
    """Occupied-cell CENTERS as a fixed-shape (max_pts, 2) cloud + mask.

    Host-side prep for the ICP polish (relocalization is a rare event, not
    a per-step path). world2grid maps cell i to world (i*res, (i+1)*res]
    (the reference's ceil-1 convention), so the center is at (i+0.5)*res —
    the half-cell matters at ICP accuracy. Evenly subsamples when more
    than max_pts cells qualify; pads with mask=False otherwise.
    """
    lo = np.asarray(logodds)
    ii, jj = np.nonzero(lo > 0)
    x = (ii + 0.5) * map_cfg.resolution + map_cfg.world_min_x
    y = (jj + 0.5) * map_cfg.resolution + map_cfg.world_min_y
    if center is not None and radius is not None:
        keep = ((x - center[0]) ** 2 + (y - center[1]) ** 2) <= radius ** 2
        x, y = x[keep], y[keep]
    n = x.shape[0]
    if n > max_pts:
        sel = np.linspace(0, n - 1, max_pts).astype(np.int64)
        x, y = x[sel], y[sel]
        n = max_pts
    out = np.zeros((max_pts, 2), np.float32)
    out[:n, 0], out[:n, 1] = x, y
    m = np.zeros(max_pts, bool)
    m[:n] = True
    return out, m


def relocalize_refined(
    logodds: jnp.ndarray, map_cfg: MapConfig, pts: jnp.ndarray,
    mask: jnp.ndarray, cfg: RelocConfig = RelocConfig(),
    center: Tuple[float, float] = (0.0, 0.0),
    icp_max_iters: int = 100, icp_max_pts: int = 4096,
    score_fn=None,
) -> Tuple[RelocResult, jnp.ndarray, jnp.ndarray]:
    """Grid search + ICP polish: returns (grid result, refined pose, icp err).

    The grid result is cell/angle-quantized; the polish runs planar ICP
    (ops/icp.py — T aligns src to tgt) from it against the occupied-cell
    centers near the candidate, recovering the sub-cell remainder.
    score_fn is forwarded to relocalize(), so the sharded multi-chip
    scorer (parallel.sharding.sharded_reloc_score) works through the
    polished entry point too.
    """
    grid_res = relocalize(hit_map(logodds), map_cfg, pts, mask, cfg, center,
                          score_fn=score_fn)
    pose0 = grid_res.pose
    # target window scales with the scan: every map cell the scan could
    # plausibly touch from the candidate pose, plus a drift margin
    scan_reach = float(jnp.max(jnp.where(
        mask, jnp.linalg.norm(pts, axis=-1), 0.0)))
    tgt, tgt_m = occupied_points(
        np.asarray(logodds), map_cfg, max_pts=icp_max_pts,
        center=(float(pose0[0]), float(pose0[1])),
        radius=scan_reach + cfg.icp_margin)
    src_w = se2.transform_points(pts[None], se2.T_from_pose(pose0[None]))[0]
    res = icp_ops.run_icp(src_w, jnp.asarray(tgt), max_iters=icp_max_iters,
                          pc1_mask=mask, pc2_mask=jnp.asarray(tgt_m),
                          normalize_error=True)
    T2 = se2.TSE2_from_TSE3(res.T)
    refined = se2.pose_from_T(T2 @ se2.T_from_pose(pose0))
    return grid_res, refined, res.error
