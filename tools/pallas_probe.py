"""Probe which Pallas/Mosaic constructs the TPU toolchain accepts.

Each variant is tiny and independent; prints PASS/FAIL per variant.
Run as the only python process on the tunnel.
"""

import sys
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def log(m):
    print(m, file=sys.stderr, flush=True)


def probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        log(f"PASS {name}: {np.asarray(out).ravel()[:4]}")
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:400]
        log(f"FAIL {name}: {type(e).__name__}: {msg}")


W, H = 64, 256
CH = 32


def v1_smem_stream():
    # 1-D SMEM BlockSpec streaming + scalar read + STATIC tile RMW
    def kernel(xs_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

        def body(i, _):
            x = xs_ref[i]
            out_ref[0:8, 0:128] = out_ref[0:8, 0:128] + jnp.float32(1.0) * x
            return 0

        jax.lax.fori_loop(0, CH, body, 0)

    xs = jnp.arange(2 * CH, dtype=jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[pl.BlockSpec((CH,), lambda i: (i,),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((W, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, H), jnp.float32),
    )(xs)


def v2_dynamic_store():
    # dynamic pl.ds read+write on out VMEM ref, offsets from SMEM ints
    def kernel(xs_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

        def body(i, _):
            x8 = pl.multiple_of((xs_ref[i] // 8) * 8, 8)
            tile = out_ref[pl.ds(x8, 8), 0:128]
            out_ref[pl.ds(x8, 8), 0:128] = tile + 1.0
            return 0

        jax.lax.fori_loop(0, CH, body, 0)

    xs = jnp.asarray(np.random.default_rng(0).integers(0, W, 2 * CH),
                     dtype=jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[pl.BlockSpec((CH,), lambda i: (i,),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((W, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, H), jnp.float32),
    )(xs)


def v3_dynamic_lane_store():
    # dynamic offsets in BOTH dims (lane offset 128-aligned)
    def kernel(xs_ref, ys_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

        def body(i, _):
            x8 = pl.multiple_of((xs_ref[i] // 8) * 8, 8)
            yl = pl.multiple_of((ys_ref[i] // 128) * 128, 128)
            tile = out_ref[pl.ds(x8, 8), pl.ds(yl, 128)]
            out_ref[pl.ds(x8, 8), pl.ds(yl, 128)] = tile + 1.0
            return 0

        jax.lax.fori_loop(0, CH, body, 0)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, W, 2 * CH), dtype=jnp.int32)
    ys = jnp.asarray(rng.integers(0, H, 2 * CH), dtype=jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[pl.BlockSpec((CH,), lambda i: (i,),
                               memory_space=pltpu.SMEM)] * 2,
        out_specs=pl.BlockSpec((W, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, H), jnp.float32),
    )(xs, ys)


def v4_masked_tile():
    # full mb1 shape: iota mask + dynamic 2-D RMW
    def kernel(xs_ref, ys_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

        s_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def body(i, _):
            x = xs_ref[i]
            y = ys_ref[i]
            x8 = pl.multiple_of((x // 8) * 8, 8)
            yl = pl.multiple_of((y // 128) * 128, 128)
            m = (s_iota == x - x8) & (l_iota == y - yl)
            tile = out_ref[pl.ds(x8, 8), pl.ds(yl, 128)]
            out_ref[pl.ds(x8, 8), pl.ds(yl, 128)] = tile + jnp.where(
                m, jnp.float32(-1.386), 0.0)
            return 0

        jax.lax.fori_loop(0, CH, body, 0)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, W, 2 * CH), dtype=jnp.int32)
    ys = jnp.asarray(rng.integers(0, H, 2 * CH), dtype=jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[pl.BlockSpec((CH,), lambda i: (i,),
                               memory_space=pltpu.SMEM)] * 2,
        out_specs=pl.BlockSpec((W, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, H), jnp.float32),
    )(xs, ys)


def v5_vmem_scalar_read():
    # scalar read from a VMEM 1-D ref (alternative to SMEM streaming)
    def kernel(xs_ref, out_ref):
        def body(i, acc):
            return acc + xs_ref[i]

        out_ref[0, 0] = jax.lax.fori_loop(0, CH, body, jnp.float32(0))

    xs = jnp.arange(CH, dtype=jnp.float32)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(xs)


def v6_full_grid_vmem():
    # 1208x1216 f32 out block resident in VMEM (size check)
    def kernel(out_ref):
        out_ref[:] = jnp.ones(out_ref.shape, out_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1208, 1216), jnp.float32),
    )()


if __name__ == "__main__":
    from lidar_slam_tpu.utils.profiling import devices_or_die
    dev = devices_or_die()[0]
    log(f"device: {dev} ({dev.platform})")
    probe("v6_full_grid_vmem", v6_full_grid_vmem)
    probe("v1_smem_stream", v1_smem_stream)
    probe("v2_dynamic_store", v2_dynamic_store)
    probe("v3_dynamic_lane_store", v3_dynamic_lane_store)
    probe("v4_masked_tile", v4_masked_tile)
    probe("v5_vmem_scalar_read", v5_vmem_scalar_read)
