"""Demo: a long plan traversed with a nav2-style ROLLING local costmap.

The reference plugin sizes its plan window from the nav2 local costmap,
which re-centers on the robot every tick (Costmap2DROS rolling_window;
NeoMpcPlanner.cpp:80-82). A STATIC window cannot follow a plan longer than
its extent — the robot hits the lethal out-of-window band and latches the
safety stop. This demo drives a 4.8 m plan through a 9.6 m world with a
3.2 m rolling window, using the zero-copy view (simulation.rolling_view):
the window is bounds metadata on the world map, no per-tick copy.

    JAX_PLATFORMS=cpu python examples/rolling_window_demo.py
    # (hosts with a site-forced backend: env -u PYTHONPATH JAX_PLATFORMS=cpu …)
"""

import numpy as np
import jax
import jax.numpy as jnp

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.scenarios import mpo700_footprint
from neo_mpc_planner2_tpu.simulation import simulate_follow_path


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
    })

    # 4.8 m gently-curved plan; world map 192 cells = 9.6 m at 0.05 m.
    n = 120
    t = np.linspace(0.0, 1.0, n)
    xs = 4.8 * t
    ys = 0.6 * np.sin(np.pi * t)
    yaw = np.arctan2(np.gradient(ys), np.gradient(xs))
    plan = mpc.Plan.create(np.stack([xs, ys, yaw], 1), max_points=128)

    rng = np.random.default_rng(4)
    yy, xx = np.meshgrid(np.arange(192) * 0.05 - 2.0,
                         np.arange(192) * 0.05 - 4.0, indexing="ij")
    grid = np.zeros((192, 192), np.float32)
    for _ in range(8):  # clutter away from the path corridor
        cx, cy = rng.uniform(0.2, 4.4), rng.uniform(-3.0, 5.0)
        if abs(cy - 0.6 * np.sin(np.pi * cx / 4.8)) < 0.7:
            cy += 1.4
        grid = np.maximum(grid, 0.9 * np.exp(
            -(((xx - cy) ** 2) + (yy - cx) ** 2) / 0.03)).astype(np.float32)
    # note: xx spans y-world here due to meshgrid order; keep a simple world
    world = mpc.Costmap.create(grid.T, origin=(-4.0, -2.0), resolution=0.05)

    res = jax.jit(lambda: simulate_follow_path(
        cfg.replace(max_plan_points=128), plan, world, mpo700_footprint(),
        jnp.zeros(3), jnp.zeros(3), 420, window_cells=64))()
    gd = np.asarray(res.goal_dist)
    poses = np.asarray(res.poses)
    reached = np.nonzero(gd < 0.05)[0]
    for i in range(0, len(poses), 60):
        print(f"tick {i:>3}  x {poses[i,0]:6.2f}  y {poses[i,1]:6.2f}  "
              f"goal dist {gd[i]:5.2f} m")
    if len(reached):
        print(f"reached goal at tick {reached[0]} "
              f"(dist {gd[reached[0]]:.3f} m) — 4.8 m plan through a "
              f"3.2 m rolling window")
    else:
        print(f"final goal dist {gd[-1]:.3f} m after {len(gd)} ticks")
    assert not np.asarray(res.lethal).any(), "lethal latch fired"


if __name__ == "__main__":
    main()
