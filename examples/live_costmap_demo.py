"""Demo: the live-costmap serving flow over the wire protocol.

The reference's server solves against a costmap that its ROS subscriptions
keep current for free (mpc_optimization_server.py:118); this framework
re-provides that as explicit ops. The demo drives a full-tick session the way
a deployment's sensor pipeline would:

  1. `set_costmap` stages the world grid ONCE (with a rolling window view),
  2. per tick, `set_costmap_update` writes only the dirty cells around a
     moving obstacle (a ~1 KB patch instead of the full grid) and re-centers
     the rolling window on the robot,
  3. `tick` runs the whole fused controller tick server-side.

The obstacle crosses the robot's corridor: the collision latch fires while
it blocks, the stuck-wait expires after it passes, and the robot reaches the
goal — the reference's signature maneuver, now driven end-to-end through the
update ops.

    env -u PYTHONPATH JAX_PLATFORMS=cpu python examples/live_costmap_demo.py
"""

import numpy as np

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.serving import OptimizerSession


def obstacle_patch(base, cx_cell, cy_cell, size, world_cells):
    """The sensor pipeline's belief for the dirty window: static base plus a
    lethal blob at the obstacle's current cell position."""
    lo = [int(np.clip(cx_cell - size // 2, 0, world_cells - size)),
          int(np.clip(cy_cell - size // 2, 0, world_cells - size))]
    win = base[lo[1]:lo[1] + size, lo[0]:lo[0] + size].copy()
    yy, xx = np.mgrid[0:size, 0:size]
    d2 = (xx + lo[0] - cx_cell) ** 2 + (yy + lo[1] - cy_cell) ** 2
    win[d2 <= 9] = 1.0  # lethal disc, radius 3 cells
    return win, lo


def main() -> None:
    cfg = mpc.config_from_ros_params({
        "prediction_horizon": 0.8, "control_steps": 3, "opt_tolerance": 1e-3,
        "acc_x_limit": 2.5, "acc_y_limit": 2.5, "acc_theta_limit": 3.0,
        "min_vel_x": -0.7, "min_vel_y": -0.7, "min_vel_theta": -0.7,
        "max_vel_x": 0.7, "max_vel_y": 0.7, "max_vel_trans": 0.7,
        "max_vel_theta": 0.7, "w_trans": 0.82, "w_orient": 0.5,
        "w_control": 0.05, "w_terminal": 0.05, "w_costmap": 0.05,
        "w_footprint": 2000.0, "waiting_time": 3.0, "low_pass_gain": 0.8,
        "lookahead_dist_min": 0.4, "lookahead_dist_max": 0.4,
        "lookahead_dist_close_to_goal": 0.4,
    }).replace(max_plan_points=64)

    W = 96          # world grid (4.8 m at 5 cm)
    res = 0.05
    base = np.zeros((W, W), np.float32)
    s = OptimizerSession(cfg)
    # Stage once: world grid + 64-cell rolling window centered on the start.
    assert s.handle({"op": "set_costmap", "data": base.tolist(),
                     "origin": [-2.4, -2.4], "resolution": res,
                     "win_cells": 64, "win_lo": [16, 16]})["ok"]
    assert s.handle({"op": "set_footprint",
                     "points": [[0.365, 0.275], [-0.365, 0.275],
                                [-0.365, -0.275], [0.365, -0.275]]})["ok"]
    plan = [[x, 0.0, 0.0] for x in np.linspace(0.0, 1.6, 48)]
    assert s.handle({"op": "set_plan", "poses": plan})["ok"]

    # Obstacle crosses the corridor at x = 0.8 m, moving in -y.
    obs = np.array([0.8, 0.9])
    obs_v = np.array([0.0, -0.45])
    pose = np.zeros(3)
    vel = np.zeros(3)
    dt = 1.0 / 30.0
    latched = reached = False
    for t in range(360):
        # 1. sensor update: dirty window around the obstacle (plus one behind
        #    it so the vacated cells revert to the base belief).
        cx = int((obs[0] + 2.4) / res)
        cy = int((obs[1] + 2.4) / res)
        win, lo = obstacle_patch(base, cx, cy, 16, W)
        # 2. window follows the robot.
        rx = int(np.clip((pose[0] + 2.4) / res - 32, 0, W - 64))
        ry = int(np.clip((pose[1] + 2.4) / res - 32, 0, W - 64))
        r = s.handle({"op": "set_costmap_update", "data": win.tolist(),
                      "lo": lo, "win_lo": [rx, ry]})
        assert r.get("ok"), r
        # 3. one full controller tick server-side.
        r = s.handle({"op": "tick", "pose": pose.tolist(),
                      "vel": vel.tolist(), "delta_t": dt})
        assert "output_vel" in r, r
        cmd = np.asarray(r["output_vel"])
        if r["collision"] or r["collision_footprint"]:
            latched = True
        # plant: integrate like the controller assumes (yaw-first omni)
        pose[2] += cmd[2] * dt
        pose[0] += (cmd[0] * np.cos(pose[2]) - cmd[1] * np.sin(pose[2])) * dt
        pose[1] += (cmd[0] * np.sin(pose[2]) + cmd[1] * np.cos(pose[2])) * dt
        vel = cmd
        obs = obs + obs_v * dt
        gd = np.linalg.norm(pose[:2] - [1.6, 0.0])
        if t % 30 == 0:
            print(f"t={t:3d} pose=({pose[0]:+.2f},{pose[1]:+.2f}) "
                  f"obs_y={obs[1]:+.2f} gd={gd:.3f} "
                  f"latched={r['collision'] or r['collision_footprint']}")
        if gd < 0.08:
            reached = True
            print(f"reached goal at tick {t} (dist {gd:.3f} m); "
                  f"collision latched en route: {latched}")
            break
    assert reached, "robot failed to reach the goal"
    assert latched, "the crossing obstacle never latched the collision stop"


if __name__ == "__main__":
    main()
