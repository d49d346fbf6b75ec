"""Microbenchmark: ways to apply per-scan log-odds updates on the TPU.

Measures, on the real chip, the per-update cost of
  1. XLA scatter-add (the round-1 baseline path, ~130M slots/s),
  2. a Pallas kernel with the grid VMEM-resident and a scalar loop doing
     one (8,128)-tile masked RMW per update,
  3. the same but one RMW per SEGMENT of ~8 updates sharing a tile
     (mask computed from the Bresenham closed form, i.e. the shape of the
     planned band-segment kernel),
  4. XLA sort of (key, payload) at per-scan sizes (for bucketing schemes),
  5. a dense full-grid pass (add + clip) = per-scan floor.

Run AS THE ONLY python process touching the tunnel:
    python tools/scatter_microbench.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

W, H = 1208, 1216  # padded grid (real: 1201x1201)
CH = 512           # updates per pallas grid step


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, args_fn, reps=5):
    """fn(*args) -> array; args vary per rep (runtime memoizes values)."""
    out = fn(*args_fn(0))
    jax.block_until_ready(out)
    t0 = time.time()
    for r in range(1, reps + 1):
        out = fn(*args_fn(r))
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def make_updates(u, seed):
    """Plausible ray-shaped updates: lines from a common center."""
    rng = np.random.default_rng(seed)
    n_rays = 1081
    k = u // n_rays + 1
    ang = rng.uniform(-2.36, 2.36, n_rays)
    step = np.arange(k)
    xs = (600 + np.cos(ang)[:, None] * step).astype(np.int32)
    ys = (600 + np.sin(ang)[:, None] * step).astype(np.int32)
    xs = xs.reshape(-1)[:u] % W
    ys = ys.reshape(-1)[:u] % H
    vs = np.where(rng.random(u) > 0.01, -1.386, 1.386).astype(np.float32)
    return jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs)


# ---------------- 1. XLA scatter ----------------
@jax.jit
def xla_scatter(xs, ys, vs):
    grid = jnp.zeros((W, H), jnp.float32)
    return grid.at[xs, ys].add(vs, mode="drop")


# ---------------- 2. Pallas per-update tile RMW ----------------
def mb_rmw_kernel(xs_ref, ys_ref, vs_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def body(i, _):
        x = xs_ref[i]
        y = ys_ref[i]
        v = vs_ref[i]
        x8 = pl.multiple_of((x // 8) * 8, 8)
        yl = pl.multiple_of((y // 128) * 128, 128)
        m = (s_iota == x - x8) & (l_iota == y - yl)
        tile = out_ref[pl.ds(x8, 8), pl.ds(yl, 128)]
        out_ref[pl.ds(x8, 8), pl.ds(yl, 128)] = tile + jnp.where(m, v, 0.0)
        return 0

    jax.lax.fori_loop(0, CH, body, 0)


def pallas_rmw(u):
    n_chunks = u // CH

    @jax.jit
    def run(xs, ys, vs):
        return pl.pallas_call(
            mb_rmw_kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((W, H), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W, H), jnp.float32),
        )(xs, ys, vs)

    return run


# ---------------- 3. Pallas per-segment RMW (8 updates/RMW) ----------------
def mb_seg_kernel(x8_ref, yl_ref, a_ref, b_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def body(i, _):
        x8 = pl.multiple_of(x8_ref[i], 8)
        yl = pl.multiple_of(yl_ref[i], 128)
        a = a_ref[i]
        b = b_ref[i]
        # Bresenham-closed-form-shaped mask: which (sublane, lane) cells of
        # this tile lie on the segment  row == (lane*a + b) // 1024
        rows = (l_iota * a + b) // 1024
        m = (rows == s_iota) & (l_iota < 96)
        tile = out_ref[pl.ds(x8, 8), pl.ds(yl, 128)]
        out_ref[pl.ds(x8, 8), pl.ds(yl, 128)] = tile + jnp.where(m, -1.386, 0.0)
        return 0

    jax.lax.fori_loop(0, CH, body, 0)


def pallas_seg(n_segments):
    n_chunks = n_segments // CH

    @jax.jit
    def run(x8, yl, a, b):
        return pl.pallas_call(
            mb_seg_kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.SMEM)
            ] * 4,
            out_specs=pl.BlockSpec((W, H), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W, H), jnp.float32),
        )(x8, yl, a, b)

    return run


# ---------------- 4. XLA sort ----------------
@jax.jit
def xla_sort(keys, vals):
    return jax.lax.sort([keys, vals], num_keys=1)


# ---------------- 5. dense pass ----------------
@jax.jit
def dense_pass(grid, delta):
    return jnp.clip(grid + delta, -20.0, 20.0)


def main():
    from lidar_slam_tpu.utils.profiling import devices_or_die
    dev = devices_or_die()[0]
    log(f"device: {dev} ({dev.platform})")

    for u in (657_408, 332_800):
        xs, ys, vs = make_updates(u, 0)

        t = timeit(xla_scatter, lambda r, u=u: make_updates(u, r))
        log(f"XLA scatter        u={u}: {t*1e3:7.2f} ms  "
            f"{u/t/1e6:7.1f}M upd/s")

        try:
            run = pallas_rmw(u)
            t = timeit(run, lambda r, u=u: make_updates(u, r))
            log(f"Pallas tile-RMW    u={u}: {t*1e3:7.2f} ms  "
                f"{u/t/1e6:7.1f}M upd/s")
        except Exception as e:
            log(f"Pallas tile-RMW    u={u}: FAILED {type(e).__name__}: "
                f"{str(e)[:300]}")

    # segment kernel: n_segments ~ updates/8
    for nseg in (82_432, 41_472):
        def seg_args(r, nseg=nseg):
            rng = np.random.default_rng(100 + r)
            x8 = (rng.integers(0, W // 8, nseg) * 8).astype(np.int32)
            yl = (rng.integers(0, H // 128, nseg) * 128).astype(np.int32)
            a = rng.integers(1, 1024, nseg).astype(np.int32)
            b = rng.integers(0, 8192, nseg).astype(np.int32)
            return (jnp.asarray(x8), jnp.asarray(yl), jnp.asarray(a),
                    jnp.asarray(b))

        try:
            run = pallas_seg(nseg)
            t = timeit(run, seg_args)
            log(f"Pallas segment     n={nseg}: {t*1e3:7.2f} ms  "
                f"{nseg/t/1e6:7.1f}M seg/s  (~{8*nseg/t/1e6:7.1f}M upd/s)")
        except Exception as e:
            log(f"Pallas segment     n={nseg}: FAILED {type(e).__name__}: "
                f"{str(e)[:300]}")

    for u in (657_408, 332_800):
        def sort_args(r, u=u):
            xs, ys, vs = make_updates(u, 200 + r)
            return (xs * H + ys).astype(jnp.int32), vs

        t = timeit(xla_sort, sort_args)
        log(f"XLA sort           u={u}: {t*1e3:7.2f} ms  "
            f"{u/t/1e6:7.1f}M el/s")

    def dense_args(r):
        rng = np.random.default_rng(300 + r)
        return (jnp.asarray(rng.normal(size=(W, H)).astype(np.float32)),
                jnp.asarray(rng.normal(size=(W, H)).astype(np.float32)))

    t = timeit(dense_pass, dense_args)
    log(f"dense add+clip     : {t*1e3:7.2f} ms  "
        f"({2*W*H*4/t/1e9:6.1f} GB/s eff)")


if __name__ == "__main__":
    main()
