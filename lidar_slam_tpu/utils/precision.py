"""Matmul precision policy.

TPU matmul units default to bfloat16 multiplication, which is catastrophic
for this workload: every matmul in the framework is small-K geometry (3x3
pose composition, Kx3 point transforms, K=3 distance cross terms) where
bf16's ~3 decimal digits corrupt rotations enough to stall ICP convergence
(observed: Kabsch rotations with diagonal 0.992). Full-f32 MXU passes cost
nothing at these shapes, so every contraction in the compute path pins
Precision.HIGHEST explicitly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST

# drop-in replacements used across the compute path
einsum = partial(jnp.einsum, precision=HIGHEST)
matmul = partial(jnp.matmul, precision=HIGHEST)
