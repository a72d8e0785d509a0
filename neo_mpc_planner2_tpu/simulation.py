"""Device-resident closed-loop FollowPath simulation.

BASELINE.json's last config is "full FollowPath loop at 50 Hz" over 4096+
scenarios. The reference could only do this one robot at a time against Gazebo;
here the whole loop — controller tick (pursuit + solve + post-processing) plus
the robot plant (the same omni kinematic model, mpc_optimization_server.py:
230-236) — runs as one `lax.scan` on device, vmap-able over scenario batches
and shardable over the mesh. No host round-trips inside the loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import MpcConfig
from .engine import ControlState, controller_step, init_state
from .ops.costmap import Costmap
from .ops.footprint import Footprint
from .ops.pursuit import Plan
from .ops.rollout import rollout

__all__ = ["SimResult", "simulate_follow_path", "batch_simulate"]


class SimResult(NamedTuple):
    poses: jnp.ndarray        # (T, 3) robot trajectory (world frame)
    cmds: jnp.ndarray         # (T, 3) commanded velocities
    collisions: jnp.ndarray   # (T,) bool predicted-collision latch
    lethal: jnp.ndarray       # (T,) bool plugin hard-stop flag
    goal_dist: jnp.ndarray    # (T,) distance to the plan goal
    converged: jnp.ndarray    # (T,) bool solver converged this tick
    solver_iters: jnp.ndarray  # (T,) SQP iterations spent this tick
    final_state: ControlState


def simulate_follow_path(
    cfg: MpcConfig,
    plan: Plan,
    costmap: Costmap,
    footprint: Footprint,
    start_pose: jnp.ndarray,
    start_vel: jnp.ndarray,
    n_ticks: int,
    parity: bool = True,
) -> SimResult:
    """Run n_ticks of the 1/controller_frequency control loop, integrating the
    command with the same kinematic model the controller assumes."""
    dt = jnp.float32(cfg.control_interval)

    def tick(carry, _):
        state, pose, vel = carry
        out = controller_step(cfg, state, plan, pose, vel, costmap, footprint,
                              dt, parity=parity)
        cmd = out.cmd_vel
        # Plant: one step of the omni model (py:230-236 semantics).
        new_pose = rollout(cmd[None, :], dt, pose)[0]
        goal = plan.goal()
        gd = jnp.linalg.norm(new_pose[:2] - goal[:2])
        return (out.state, new_pose, cmd), (new_pose, cmd, out.collision,
                                            out.lethal, gd,
                                            out.solver_converged,
                                            out.solver_iters)

    init = (init_state(cfg), jnp.asarray(start_pose, jnp.float32),
            jnp.asarray(start_vel, jnp.float32))
    (fin_state, _, _), (poses, cmds, cols, lethal, gd, conv, iters) = \
        jax.lax.scan(tick, init, None, length=n_ticks)
    return SimResult(poses=poses, cmds=cmds, collisions=cols, lethal=lethal,
                     goal_dist=gd, converged=conv, solver_iters=iters,
                     final_state=fin_state)


def batch_simulate(cfg: MpcConfig, scenario_batch, n_ticks: int,
                   parity: bool = True) -> SimResult:
    """vmap simulate_follow_path over a ScenarioBatch (scenarios.py)."""
    def one(plan, cm, fp, pose, vel):
        return simulate_follow_path(cfg, plan, cm, fp, pose, vel, n_ticks,
                                    parity=parity)

    sb = scenario_batch
    return jax.vmap(one)(sb.plan, sb.costmap, sb.footprint, sb.robot_pose,
                         sb.current_vel)
