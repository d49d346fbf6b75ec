"""Pose-graph optimum verification at dataset-20 scale (VERDICT round-1 #5).

GTSAM is not installed, so the stand-in independent solver is scipy
least_squares (trf) over the same residuals in f64. On this
ill-conditioned 5k-pose chain+loops graph trf converges far too slowly to
reproduce the optimum to 1e-6 from scratch (500 analytic-Jacobian
iterations at n=300 still end 7e-5 away with a HIGHER cost than ours), so
the at-scale verification is the stronger stationarity form:

  1. our LM solution is a first-order stationary point of the f64 cost
     (|grad|_inf collapses by many orders of magnitude vs the init), and
  2. scipy trf STARTED AT our solution (analytic sparse Jacobian) cannot
     improve the cost beyond float noise and barely moves the poses, and
  3. scipy trf from the odometry init (bounded budget) never reaches a
     cost below ours, and lands in the same basin.

LM iteration counts are asserted to stay in the exact-step regime
(direct solver: < 15 iterations, vs the round-1 CG path's 50-iter cap).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import scipy.sparse as sp
from scipy.optimize import least_squares

from lidar_slam_tpu.config import PoseGraphConfig
from lidar_slam_tpu.models import pose_graph as pg
from lidar_slam_tpu.utils import se2


def _make_problem(seed, n, interval=10):
    """Synthetic dataset-20-shaped graph: smooth ground truth, noisy
    scan-matching-quality relative measurements, gated interval loops."""
    rng = np.random.default_rng(seed)
    w = np.cumsum(rng.normal(0, 0.02, n))
    v = 0.12 + 0.05 * np.sin(np.arange(n) * 0.01)
    th = np.cumsum(w * 0.025)
    x = np.cumsum(v * np.cos(th) * 0.025)
    y = np.cumsum(v * np.sin(th) * 0.025)
    gt = np.stack([x, y, th], -1)

    rel = se2.get_relative_pose(gt[:-1], gt[1:])
    nz = rng.normal(0, [0.004, 0.004, 0.002], (n - 1, 3))
    rel_noisy = se2.T_from_pose(se2.pose_from_T(jnp.asarray(rel))
                                + jnp.asarray(nz))
    init = se2.pose_from_T(se2.compose_chain(
        rel_noisy, se2.T_from_pose(jnp.asarray(gt[0]))))

    cand = np.arange(0, n - interval - 1, interval, dtype=np.int32)
    lm = se2.get_relative_pose(gt[cand], gt[cand + interval])
    lnz = rng.normal(0, [0.01, 0.01, 0.005], (len(cand), 3))
    loop_meas = se2.T_from_pose(se2.pose_from_T(jnp.asarray(lm))
                                + jnp.asarray(lnz))
    mask = jnp.asarray(rng.random(len(cand)) > 0.05)
    g = pg.make_graph(jnp.asarray(rel_noisy, jnp.float64), PoseGraphConfig(),
                      loop_i=jnp.asarray(cand), loop_j=jnp.asarray(cand + 10),
                      loop_meas=jnp.asarray(loop_meas, jnp.float64),
                      loop_mask=mask)
    return jnp.asarray(np.asarray(init), jnp.float64), g


def _sparse_jac(n, g):
    """Analytic sparse Jacobian of pg.residuals from the per-factor
    3x3 blocks (same linearization the solver uses)."""
    idx_i = jnp.arange(n - 1)
    inv_b = 1.0 / g.between_sigmas
    inv_l = 1.0 / g.loop_sigmas
    inv_p = 1.0 / g.prior_sigmas
    li = np.asarray(g.loop_i)
    lj = np.asarray(g.loop_j)
    L = len(li)

    def jac(xflat):
        x = jnp.asarray(xflat).reshape(n, 3)
        Jp = jax.jacfwd(lambda p: se2.log_se2(
            se2.inverse_T(se2.T_from_pose(g.prior_pose))
            @ se2.T_from_pose(p)) * inv_p)(x[0])
        _, (Jbi, Jbj) = pg._factor_r_and_J(x[idx_i], x[idx_i + 1],
                                           g.between_meas, inv_b)
        _, (Jli, Jlj) = pg._factor_r_and_J(x[li], x[lj], g.loop_meas, inv_l)
        lw = np.asarray(g.loop_mask, np.float64)[:, None, None]
        Jli = np.asarray(Jli) * lw
        Jlj = np.asarray(Jlj) * lw

        rows, cols, vals = [], [], []

        def blk(r0, c0, Jb):
            rr, cc = np.meshgrid(np.arange(3), np.arange(3), indexing="ij")
            rows.append((r0 + rr).ravel())
            cols.append((c0 + cc).ravel())
            vals.append(np.asarray(Jb).ravel())

        blk(0, 0, Jp)
        r = 3
        Jbi = np.asarray(Jbi)
        Jbj = np.asarray(Jbj)
        for i in range(n - 1):
            blk(r, 3 * i, Jbi[i])
            blk(r, 3 * (i + 1), Jbj[i])
            r += 3
        for l in range(L):
            blk(r, 3 * int(li[l]), Jli[l])
            blk(r, 3 * int(lj[l]), Jlj[l])
            r += 3
        return sp.coo_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(r, 3 * n)).tocsr()

    return jac


@pytest.mark.slow
def test_optimum_stationary_and_unimprovable_at_scale():
    n = 4956
    init, g = _make_problem(0, n)
    res = pg.optimize(init, g, max_iters=50, solver="direct")
    assert int(res.iterations) < 15, "direct LM should converge in few steps"

    cost_fn = jax.jit(lambda x: pg.graph_cost(x, g))
    grad_fn = jax.jit(jax.grad(lambda x: pg.graph_cost(x, g)))
    g0 = float(jnp.abs(grad_fn(init)).max())
    g1 = float(jnp.abs(grad_fn(res.poses)).max())
    assert float(res.cost) < float(cost_fn(init)) * 0.9
    assert g1 < 1e-6, f"not stationary: |grad|_inf={g1:.2e}"
    assert g1 < g0 * 1e-6, f"grad only fell {g0:.2e} -> {g1:.2e}"

    # independent solver warm-started at our optimum: no improvement
    resid = jax.jit(lambda x: pg.residuals(jnp.asarray(x).reshape(n, 3), g))
    jac = _sparse_jac(n, g)
    sol = least_squares(lambda x: np.asarray(resid(x)),
                        np.asarray(res.poses).ravel(), jac=jac,
                        method="trf", max_nfev=4,
                        xtol=3e-16, ftol=3e-16, gtol=1e-15)
    ours = float(res.cost)
    assert sol.cost >= ours - 1e-9 * max(ours, 1.0), \
        f"scipy improved our optimum: {ours} -> {sol.cost}"
    moved = np.abs(sol.x.reshape(n, 3) - np.asarray(res.poses)).max()
    assert moved < 1e-6, f"scipy moved poses by {moved:.2e}"


@pytest.mark.slow
def test_scipy_from_init_never_beats_ours():
    n = 600
    init, g = _make_problem(1, n)
    res = pg.optimize(init, g, max_iters=60, solver="direct")
    resid = jax.jit(lambda x: pg.residuals(jnp.asarray(x).reshape(n, 3), g))
    jac = _sparse_jac(n, g)
    sol = least_squares(lambda x: np.asarray(resid(x)),
                        np.asarray(init).ravel(), jac=jac, method="trf",
                        max_nfev=120, xtol=3e-16, ftol=3e-16, gtol=1e-15)
    ours = float(res.cost)
    assert sol.cost >= ours - 1e-10, (sol.cost, ours)
    # same basin: trf approaches our optimum from the same init
    diff = np.abs(sol.x.reshape(n, 3) - np.asarray(res.poses)).max()
    assert diff < 5e-3, f"different optima? pose diff {diff:.2e}"


@pytest.mark.slow
def test_banded_matches_direct_at_dataset_scale():
    """The production default (solver='banded', SlamConfig) must reach the
    direct solver's optimum on a dataset-20-scale fixed-interval graph —
    the at-scale companion of test_banded_solver_matches_direct."""
    n = 4956
    init, g = _make_problem(2, n)
    rd = pg.optimize(init, g, max_iters=50, solver="direct")
    rb = pg.optimize(init, g, max_iters=50, solver="banded", band=10)
    assert int(rb.iterations) < 15
    np.testing.assert_allclose(np.asarray(rb.poses), np.asarray(rd.poses),
                               atol=1e-5)
    grad_fn = jax.jit(jax.grad(lambda x: pg.graph_cost(x, g)))
    g1 = float(jnp.abs(grad_fn(rb.poses)).max())
    assert g1 < 1e-6, f"banded optimum not stationary: {g1:.2e}"
