"""Omnidirectional kinematic rollout.

The reference integrates the same first-order omni model in four places
(objective py:230-236, publishLocalPlan py:293-297, collision_check py:323-327
— all in mpc_optimization_server.py), always with the yaw updated *before* the
position so the position update uses the post-step yaw:

    yaw_{i+1} = yaw_i + w_i * dt
    x_{i+1}   = x_i + (vx_i * cos(yaw_{i+1}) - vy_i * sin(yaw_{i+1})) * dt
    y_{i+1}   = y_i + (vx_i * sin(yaw_{i+1}) + vy_i * cos(yaw_{i+1})) * dt

Here it is one fully-unrolled `lax.scan` (control_steps is tiny and static, so
XLA flattens it into straight-line VPU code), differentiable and batchable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rollout"]


def rollout(cmd_vel: jnp.ndarray, dt: jnp.ndarray, init_pose: jnp.ndarray) -> jnp.ndarray:
    """Integrate controls from init_pose.

    cmd_vel:   (N, 3) per-step [vx, vy, w] body-frame velocities.
    dt:        () integration interval (config.dt = horizon / control_steps).
    init_pose: (3,) starting [x, y, yaw].

    Returns (N, 3) poses *after* each step (the reference accumulates in-place,
    so step i's costs read the i-th post-update state).
    """
    n = cmd_vel.shape[0]

    def step(pose, u):
        yaw = pose[2] + u[2] * dt
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        x = pose[0] + (u[0] * c - u[1] * s) * dt
        y = pose[1] + (u[0] * s + u[1] * c) * dt
        nxt = jnp.stack([x, y, yaw])
        return nxt, nxt

    _, traj = jax.lax.scan(step, init_pose, cmd_vel, unroll=n)
    return traj
