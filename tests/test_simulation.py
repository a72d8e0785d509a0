"""Closed-loop simulation tests: the device-resident FollowPath loop must
reach goals, respect limits, and stop for obstacles — the Gazebo-style
validation the reference relied on (README.md:14-16), but in-repo and batched."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.simulation import batch_simulate, simulate_follow_path
from neo_mpc_planner2_tpu.scenarios import make_scenario_batch


@pytest.fixture(scope="module")
def sim_cfg():
    return mpc.default_config().replace(
        prediction_horizon=0.8, opt_tolerance=1e-3, footprint_edge_samples=8,
        max_plan_points=64, solver_max_iters=30,
        acc_x_limit=2.5, acc_y_limit=2.5, acc_theta_limit=3.0,
        min_vel_x=-0.7, min_vel_y=-0.7, min_vel_theta=-0.7,
        max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7, max_vel_theta=0.7,
        w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
        w_costmap=0.05, w_footprint=0.0,
        lookahead_dist_min=0.4, lookahead_dist_max=0.4,
        lookahead_dist_close_to_goal=0.4,
    )


def test_reaches_goal_straight_line(sim_cfg):
    plan = mpc.Plan.create(
        np.stack([np.linspace(0, 2, 50), np.zeros(50), np.zeros(50)], 1),
        max_points=sim_cfg.max_plan_points)
    cm = mpc.Costmap.create(np.zeros((120, 120)), origin=(-1.0, -1.0),
                            resolution=0.05)
    fp = mpc.Footprint.rectangle(0.6, 0.4)
    res = jax.jit(lambda: simulate_follow_path(
        sim_cfg, plan, cm, fp, jnp.zeros(3), jnp.zeros(3), 200))()
    gd = np.asarray(res.goal_dist)
    assert gd[-1] < 0.05, gd[-1]
    # Speed cone respected at every tick.
    speeds = np.hypot(np.asarray(res.cmds)[:, 0], np.asarray(res.cmds)[:, 1])
    assert speeds.max() <= sim_cfg.max_vel_trans + 1e-4
    # Acceleration clamp: per-tick command delta bounded.
    d = np.abs(np.diff(np.asarray(res.cmds), axis=0))
    lim = np.array([sim_cfg.acc_x_limit, sim_cfg.acc_y_limit,
                    sim_cfg.acc_theta_limit]) * sim_cfg.control_interval
    assert np.all(d <= lim + 1e-4)


def test_wall_stops_robot(sim_cfg):
    data = np.zeros((120, 120))
    data[:, 30:] = 1.0  # lethal wall at x > 0.5 (origin -1, res 0.05)
    cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
    plan = mpc.Plan.create(
        np.stack([np.linspace(0, 2, 50), np.zeros(50), np.zeros(50)], 1),
        max_points=sim_cfg.max_plan_points)
    fp = mpc.Footprint.rectangle(0.6, 0.4)
    res = jax.jit(lambda: simulate_follow_path(
        sim_cfg, plan, cm, fp, jnp.zeros(3), jnp.zeros(3), 150))()
    # The robot never drives its center into the wall.
    assert np.asarray(res.poses)[:, 0].max() < 0.5
    # And either latched a predicted collision / footprint stop or the lethal
    # gate fired at some point.
    assert bool(np.asarray(res.collisions).any() | np.asarray(res.lethal).any())


def test_batched_simulation(sim_cfg):
    sb = make_scenario_batch(sim_cfg, 4, seed=1, map_size=64, plan_points=32)
    res = jax.jit(lambda: batch_simulate(sim_cfg, sb, 60))()
    assert res.poses.shape == (4, 60, 3)
    assert np.all(np.isfinite(np.asarray(res.poses)))
    # Most scenarios make progress toward their goals.
    gd = np.asarray(res.goal_dist)
    assert (gd[:, -1] < gd[:, 0]).sum() >= 3


def test_corridor_carving_clamps_plan_neighborhood(sim_cfg):
    """clear_corridor_m reproduces the global-planner contract: no cell within
    the corridor radius of the plan polyline exceeds corridor_max_cost, and
    cells far from every plan stay untouched vs the uncarved batch."""
    kw = dict(batch=16, seed=7, map_size=64, n_obstacles=8, plan_points=64,
              lethal_threshold=0.8, plan_length_range=(0.7, 1.1))
    raw = make_scenario_batch(sim_cfg, **kw)
    carved = make_scenario_batch(sim_cfg, clear_corridor_m=0.55,
                                 corridor_max_cost=0.6, **kw)
    res = float(raw.costmap.resolution[0])
    half = 64 * res / 2.0
    centers = np.arange(64) * res - half + res / 2.0
    cxx, cyy = np.meshgrid(centers, centers, indexing="xy")  # [y, x] grid
    pts = np.asarray(raw.plan.px), np.asarray(raw.plan.py)
    for b in range(16):
        n = int(np.asarray(raw.plan.n_valid)[b])
        px, py = pts[0][b][:n], pts[1][b][:n]
        d = np.sqrt((cxx[None] - px[:, None, None]) ** 2
                    + (cyy[None] - py[:, None, None]) ** 2).min(0)
        cm = np.asarray(carved.costmap.data[b])
        rm = np.asarray(raw.costmap.data[b])
        # The generator subsamples every 2nd plan pose; leave the half-gap
        # (~2 cm at these plan lengths) of slack on the inside of the radius.
        assert cm[d < 0.53].max() <= 0.6 + 1e-6
        far = d > 0.55 + res  # strictly outside (cell-center metric slack)
        np.testing.assert_array_equal(cm[far], rm[far])
