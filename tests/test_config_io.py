"""Config / IO parity: the reference's verbatim navigation.yaml sample
(README.md:27-86) must load 1:1; raw-scale costmap converters."""

import numpy as np
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.cli import _load_params_file

# Verbatim from /root/reference/README.md:27-86 (the sample parameters users
# already have in their navigation.yaml).
REFERENCE_SAMPLE_YAML = """
controller_server:
  ros__parameters:
    controller_plugins: ["FollowPath"]
    controller_frequency: 30.0
    controller_plugin_types: ["neo_mpc_planner::NeoMpcPlanner"]
    goal_checker_plugins: ["general_goal_checker"]
    progress_checker:
      plugin: "nav2_controller::SimpleProgressChecker"
      required_movement_radius: 0.5
      movement_time_allowance: 100.0
    general_goal_checker:
      plugin: "nav2_controller::SimpleGoalChecker"
      xy_goal_tolerance: 0.03
      yaw_goal_tolerance: 0.03
      stateful: True
    FollowPath:
      plugin: "neo_mpc_planner::NeoMpcPlanner"
      lookahead_dist_min: 0.4
      lookahead_dist_max: 0.4
      lookahead_dist_close_to_goal: 0.4
      control_steps: 3

mpc_optimization_server:
  ros__parameters:
    acc_x_limit: 2.5
    acc_y_limit: 2.5
    acc_theta_limit: 3.0
    min_vel_x: -0.7
    min_vel_y: -0.7
    min_vel_trans: -0.7
    min_vel_theta: -0.7
    max_vel_x: 0.7
    max_vel_y: 0.7
    max_vel_trans: 0.7
    max_vel_theta: 0.7
    w_trans: 0.82
    w_orient: 0.50
    w_control: 0.05
    w_terminal: 0.05
    w_footprint: 0
    w_costmap: 0.05
    waiting_time: 3.0
    low_pass_gain: 0.5
    opt_tolerance: 1e-3
    prediction_horizon: 0.8
    control_steps: 3
"""


def test_reference_sample_yaml_loads(tmp_path):
    p = tmp_path / "navigation.yaml"
    p.write_text(REFERENCE_SAMPLE_YAML)
    params = _load_params_file(str(p))
    cfg = mpc.config_from_ros_params(params)

    # Server section (README.md:53-84).
    assert cfg.acc_x_limit == 2.5
    assert cfg.acc_theta_limit == 3.0
    assert cfg.min_vel_x == -0.7
    assert cfg.max_vel_trans == 0.7
    assert cfg.w_trans == 0.82
    assert cfg.w_footprint == 0
    assert cfg.opt_tolerance == pytest.approx(1e-3)
    assert cfg.prediction_horizon == 0.8
    assert cfg.control_steps == 3
    assert cfg.dt == pytest.approx(0.8 / 3)
    # Plugin section (README.md:44-49) + controller frequency (README.md:32).
    assert cfg.lookahead_dist_min == 0.4
    assert cfg.lookahead_dist_close_to_goal == 0.4
    assert cfg.controller_frequency == 30.0
    assert cfg.control_interval == pytest.approx(1.0 / 30.0)


class TestRawScaleCostmaps:
    def test_nav2_raw_scale(self):
        raw = np.zeros((10, 10), np.uint8)
        raw[0, 0] = 255   # lethal
        raw[0, 1] = 254   # inscribed
        raw[0, 2] = 200   # the slow-down gate value
        cm = mpc.Costmap.from_nav2_costmap(raw, origin=(0, 0), resolution=0.1)
        d = np.asarray(cm.data)
        # Only raw 255 is exactly lethal (the cpp:234 == 255 test); 254 stays
        # below the exact-equality gates but above the 0.99 collision check.
        assert d[0, 0] == 1.0
        assert d[0, 1] == pytest.approx(254 / 255)
        assert d[0, 1] < 1.0
        assert d[0, 1] >= 0.99
        assert d[0, 2] == pytest.approx(200 / 255)

    def test_nav2_inscribed_lethal_flag(self):
        raw = np.full((4, 4), 254, np.uint8)
        cm = mpc.Costmap.from_nav2_costmap(raw, inscribed_is_lethal=True)
        assert np.all(np.asarray(cm.data) == 1.0)

    def test_occupancy_grid(self):
        g = np.zeros((5, 5), np.int8)
        g[1, 1] = 100
        g[2, 2] = -1  # unknown
        g[3, 3] = 50
        cm = mpc.Costmap.from_occupancy_grid(g)
        d = np.asarray(cm.data)
        assert d[1, 1] == 1.0
        assert d[2, 2] == 1.0
        assert d[3, 3] == pytest.approx(0.5)
        cm2 = mpc.Costmap.from_occupancy_grid(g, unknown_is_lethal=False)
        assert np.asarray(cm2.data)[2, 2] == 0.0


def test_orbax_checkpoint_roundtrip(cfg, tmp_path):
    from neo_mpc_planner2_tpu.checkpoint import load_state, save_state

    st = mpc.init_state(cfg)
    st = st.replace(initial_guess=np.arange(9, dtype=np.float32))
    path = str(tmp_path / "orbax_ckpt")
    save_state(path, st)
    back = load_state(path, template=st)
    np.testing.assert_array_equal(np.asarray(back.initial_guess),
                                  np.asarray(st.initial_guess))
    assert bool(back.slow_down) == bool(st.slow_down)


def test_fleet_config_preset():
    """fleet_config: the measured fast operating point — differs from the
    bit-parity default only in the documented solver knobs, and drives a
    closed loop to the same place."""
    import dataclasses

    import jax

    from neo_mpc_planner2_tpu.scenarios import make_scenario_batch
    from neo_mpc_planner2_tpu.simulation import batch_simulate

    fast = mpc.fleet_config()
    base = mpc.default_config()
    diffs = {f.name for f in dataclasses.fields(mpc.MpcConfig)
             if getattr(fast, f.name) != getattr(base, f.name)}
    assert diffs == {"solver_max_iters", "solver_max_backtracks",
                     "solver_ls_coarse_after", "solver_ls_coarse_factor",
                     "solver_costmap_u8", "solver_ls_quad_interp"}
    cfg = fast.replace(opt_tolerance=1e-3, footprint_edge_samples=8,
                       max_plan_points=32)
    sb = make_scenario_batch(cfg, 8, seed=3, map_size=32, plan_points=24,
                             plan_length_range=(0.5, 0.8))
    run = jax.jit(lambda b: batch_simulate(cfg, b, 30))(sb)
    gd = np.asarray(run.goal_dist)
    # Fleet-level progress over a 1 s run (individual lanes may wander at
    # this short horizon with the default 0.5 m lookahead).
    assert gd[:, -1].mean() < gd[:, 0].mean()
    assert (gd[:, -1] < gd[:, 0]).mean() >= 0.7
