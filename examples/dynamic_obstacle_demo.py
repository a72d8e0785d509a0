"""Demo: the stuck-wait maneuver against a crossing dynamic obstacle.

This is the scenario class the reference's 3 s stuck-wait exists for
(mpc_optimization_server.py:374-382): an obstacle crosses the robot's
corridor, the predicted-collision check latches and zeroes the command,
the stuck timer accumulates, the latch expires after `waiting_time`, and —
once the obstacle has passed — the robot resumes and reaches its goal.

Runs fully on device: the costmap is re-synthesized every tick with the
obstacle's center advanced along its velocity (simulation.batch_simulate
`dynamic_obstacles`), the batched equivalent of the fresh costmap the
reference's server receives with every service call.

    JAX_PLATFORMS=cpu python examples/dynamic_obstacle_demo.py
    # (hosts with a site-forced backend: env -u PYTHONPATH JAX_PLATFORMS=cpu …)
"""

import numpy as np
import jax
import jax.numpy as jnp

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.engine import init_state
from neo_mpc_planner2_tpu.ops.pursuit import Plan
from neo_mpc_planner2_tpu.scenarios import ScenarioBatch, mpo700_footprint
from neo_mpc_planner2_tpu.simulation import batch_simulate


def main() -> None:
    cfg = mpc.config_from_ros_params({
        "acc_x_limit": 2.5, "acc_y_limit": 2.5, "acc_theta_limit": 3.0,
        "min_vel_x": -0.7, "min_vel_y": -0.7, "min_vel_theta": -0.7,
        "max_vel_x": 0.7, "max_vel_y": 0.7, "max_vel_trans": 0.7,
        "max_vel_theta": 0.7, "w_trans": 0.82, "w_orient": 0.5,
        "w_control": 0.05, "w_terminal": 0.05, "w_costmap": 0.05,
        "w_footprint": 0.0, "low_pass_gain": 0.5, "opt_tolerance": 1e-3,
        "prediction_horizon": 0.8, "control_steps": 3,
        "lookahead_dist_min": 0.4, "lookahead_dist_max": 0.4,
        "lookahead_dist_close_to_goal": 0.4, "controller_frequency": 30.0,
    }).replace(max_plan_points=64)

    # Straight 2 m plan along +x; one lethal obstacle crossing it at x=1.0
    # from the side, timed to block the corridor as the robot arrives.
    n = 50
    plan = Plan.create(
        np.stack([np.linspace(0, 2.0, n), np.zeros(n), np.zeros(n)], 1),
        max_points=cfg.max_plan_points)
    B = 1
    grid = jnp.zeros((B, 96, 96), jnp.float32)  # geometry carrier (re-synthesized)
    costmap = mpc.Costmap(
        data=grid, origin=jnp.full((B, 2), -2.4, jnp.float32),
        resolution=jnp.full((B,), 0.05, jnp.float32))
    state = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                         init_state(cfg))
    sb = ScenarioBatch(
        state=state,
        plan=jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), plan),
        robot_pose=jnp.zeros((B, 3), jnp.float32),
        current_vel=jnp.zeros((B, 3), jnp.float32),
        costmap=costmap,
        footprint=jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), mpo700_footprint()),
        delta_t=jnp.full((B,), 1 / 30, jnp.float32),
    )
    # Obstacle starts 1.1 m beside the path at x=1.0, crossing at 0.45 m/s:
    # reaches the corridor ~tick 55, clears it ~tick 105.
    centers = jnp.asarray([[[1.0, -1.1]]], jnp.float32)   # (B, O, 2)
    amp = jnp.asarray([[1.0]], jnp.float32)
    vel = jnp.asarray([[[0.0, 0.45]]], jnp.float32)

    res = jax.jit(lambda b: batch_simulate(
        cfg, b, 260, dynamic_obstacles=(centers, amp, vel),
        obstacle_lethal_threshold=0.5))(sb)
    gd = np.asarray(res.goal_dist[0])
    coll = np.asarray(res.collisions[0])
    cmds = np.asarray(res.cmds[0])
    for i in range(0, 260, 26):
        print(f"tick {i:>3}  goal dist {gd[i]:5.2f} m  "
              f"collision latch {'ON ' if coll[i] else 'off'}  "
              f"|cmd| {np.hypot(cmds[i,0], cmds[i,1]):.2f} m/s")
    stops = np.nonzero(coll)[0]
    reached = np.nonzero(gd < 0.08)[0]
    assert len(stops), "the crossing obstacle never latched the stop"
    assert len(reached), f"goal not reached (final dist {gd[-1]:.3f})"
    print(f"\nlatched (stopped) ticks {stops[0]}..{stops[-1]} "
          f"({(stops[-1]-stops[0])/30:.1f} s incl. the 3 s stuck-wait), "
          f"then resumed and reached the goal at tick {reached[0]}")


if __name__ == "__main__":
    main()
