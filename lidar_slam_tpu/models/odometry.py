"""Differential-drive dead-reckoning odometry.

Capability parity with the reference odometry stage
(reference: modules/localization.py:15-93,136-199), redesigned TPU-first:
encoder->velocity is one vectorized pass over all steps, and the sequential
pose propagation is a single `lax.scan` over the sinc-corrected motion model —
one fused XLA loop instead of ~5k Python iterations.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import RobotConfig
from ..utils import se2

# single source of truth for the platform constants
# (reference hardcodes them twice: modules/localization.py:11-13 and :147-148)
DIST_PER_TICK = RobotConfig().dist_per_tick
FREQ = RobotConfig().encoder_freq


def v_from_encoder(counts: jnp.ndarray) -> jnp.ndarray:
    """Velocity from encoder counts [FR, FL, RR, RL]; batched over leading dims.

    (reference: modules/localization.py:136-160)
    """
    distance_right = (counts[..., 0] + counts[..., 2]) / 2 * DIST_PER_TICK
    distance_left = (counts[..., 1] + counts[..., 3]) / 2 * DIST_PER_TICK
    return (distance_right + distance_left) / 2 * FREQ


def dist_from_encoder(counts: jnp.ndarray) -> jnp.ndarray:
    """Per-step distance from encoder counts; batched over leading dims.

    NB: matches the reference exactly, including that it averages FR and FL
    (counts[0], counts[1]) rather than right/rear pairs
    (reference: modules/localization.py:179-199).
    """
    distance_right = counts[..., 0] * DIST_PER_TICK
    distance_left = counts[..., 1] * DIST_PER_TICK
    return (distance_right + distance_left) / 2


def distance_travelled(v_ts: jnp.ndarray) -> jnp.ndarray:
    """Cumulative distance at every pose (reference: modules/localization.py:38-58)."""
    return jnp.cumsum(dist_from_encoder(v_ts))


def _sinc_half(dtheta: jnp.ndarray) -> jnp.ndarray:
    """sin(dtheta/2) / (dtheta/2), safely 1 at dtheta == 0.

    The reference evaluates the raw quotient (modules/localization.py:32-33),
    which NaNs on an exactly-zero gyro sample; the series limit is the correct
    continuous extension and is what we compute here.
    """
    h = dtheta / 2.0
    small = jnp.abs(h) < 1e-8
    safe_h = jnp.where(small, 1.0, h)
    return jnp.where(small, 1.0 - h * h / 6.0, jnp.sin(safe_h) / safe_h)


def diff_drive_motion_model(pose_t: jnp.ndarray, v_t: jnp.ndarray,
                            w_t: jnp.ndarray, dt: float) -> jnp.ndarray:
    """One step of the sinc-corrected diff-drive model; batched over leading dims.

    (reference: modules/localization.py:15-36; w_t is the gyro 3-vector, yaw
    rate is its last component)
    """
    dtheta = w_t[..., -1] * dt
    x, y, theta = pose_t[..., 0], pose_t[..., 1], pose_t[..., 2]
    k = v_t * dt * _sinc_half(dtheta)
    x = x + k * jnp.cos(theta + dtheta / 2.0)
    y = y + k * jnp.sin(theta + dtheta / 2.0)
    return jnp.stack([x, y, theta + dtheta], axis=-1)


@partial(jax.jit, static_argnames=("dt", "return_relative_poses"))
def poses_from_odometry(
    v_ts: jnp.ndarray,
    w_ts: jnp.ndarray,
    x_0: jnp.ndarray | None = None,
    dt: float = 1.0 / 40.0,
    return_relative_poses: bool = False,
):
    """Propagate all N poses with one lax.scan.

    Matches reference modules/localization.py:60-93: step i (1-based) uses
    encoder row i and gyro row i. Returns (N, 3) poses and optionally the
    (N-1, 3, 3) relative SE(2) transforms, computed in closed form from
    consecutive poses instead of inside the loop.
    """
    if x_0 is None:
        x_0 = jnp.zeros(3, dtype=jnp.result_type(v_ts.dtype, jnp.float32))
    x_0 = jnp.asarray(x_0, dtype=jnp.result_type(v_ts.dtype, jnp.float32))

    v = v_from_encoder(v_ts)[1:]  # (N-1,)
    dth = w_ts[1:, -1] * dt  # (N-1,)

    def step(pose, inp):
        v_i, dth_i = inp
        x, y, theta = pose
        k = v_i * dt * _sinc_half(dth_i)
        nxt = jnp.stack([
            x + k * jnp.cos(theta + dth_i / 2.0),
            y + k * jnp.sin(theta + dth_i / 2.0),
            theta + dth_i,
        ])
        return nxt, nxt

    _, rest = jax.lax.scan(step, x_0, (v, dth))
    poses = jnp.concatenate([x_0[None], rest], axis=0)

    if return_relative_poses:
        relative = se2.get_relative_pose(poses[:-1], poses[1:])
        return poses, relative
    return poses


@partial(jax.jit, static_argnames=("dt",))
def max_step_gates(v_ts: jnp.ndarray, w_ts: jnp.ndarray,
                   dt: float = 1.0 / 40.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Loop-closure gates: max per-step encoder distance and max per-step yaw
    (degrees) over the whole log (reference: main.py:94-101)."""
    max_distance = jnp.max(dist_from_encoder(v_ts))
    max_yaw_deg = jnp.rad2deg(jnp.max(jnp.abs(w_ts), axis=0)[2] * dt)
    return max_distance, max_yaw_deg
