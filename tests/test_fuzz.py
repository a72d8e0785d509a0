"""Randomized-input robustness: no configuration or input in the plausible
envelope may produce NaN commands, constraint violations, or crashes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_engine_fuzz(seed):
    rng = np.random.default_rng(seed)
    cfg = mpc.default_config().replace(
        prediction_horizon=float(rng.uniform(0.3, 1.5)),
        control_steps=int(rng.integers(1, 6)),
        opt_tolerance=float(10 ** rng.uniform(-8, -2)),
        footprint_edge_samples=8,
        max_plan_points=32,
        solver_max_iters=int(rng.integers(5, 40)),
        low_pass_gain=float(rng.uniform(0.05, 1.0)),
        acc_x_limit=float(rng.uniform(0.3, 4.0)),
        acc_y_limit=float(rng.uniform(0.3, 4.0)),
        acc_theta_limit=float(rng.uniform(0.3, 4.0)),
        min_vel_x=float(rng.uniform(-1.0, 0.0)),
        min_vel_y=float(rng.uniform(-1.0, -0.1)),
        min_vel_theta=float(rng.uniform(-1.5, -0.1)),
        max_vel_x=float(rng.uniform(0.2, 1.2)),
        max_vel_y=float(rng.uniform(0.1, 1.2)),
        max_vel_trans=float(rng.uniform(0.2, 1.2)),
        max_vel_theta=float(rng.uniform(0.1, 1.5)),
        w_trans=float(rng.uniform(0, 2)), w_orient=float(rng.uniform(0, 2)),
        w_control=float(rng.uniform(0, 1)), w_terminal=float(rng.uniform(0, 1)),
        w_costmap=float(rng.uniform(0, 2)),
        w_footprint=float(rng.choice([0.0, 100.0, 2000.0])),
        lookahead_dist_min=float(rng.uniform(0.1, 0.6)),
        lookahead_dist_max=float(rng.uniform(0.2, 0.8)),
        lookahead_dist_close_to_goal=float(rng.uniform(0.1, 0.6)),
        # Round-3 line-search knobs in the fuzz envelope.
        solver_max_backtracks=int(rng.choice([7, 10, 16])),
        solver_ls_coarse_after=int(rng.choice([0, 2])),
        solver_ls_coarse_factor=float(rng.choice([0.0625, 0.125, 0.25])),
        solver_ls_warm_alpha=bool(rng.choice([False, True])),
    )
    eng = mpc.MpcEngine(cfg)
    state = eng.init_state()
    data = rng.uniform(0, 1, (40, 40))
    data[rng.integers(0, 40, 15), rng.integers(0, 40, 15)] = 1.0
    cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
    n = int(rng.integers(2, 30))
    plan = mpc.Plan.create(
        np.cumsum(rng.uniform(-0.1, 0.15, (n, 3)) * [1, 1, 0.5], axis=0),
        max_points=cfg.max_plan_points)
    fp = mpc.Footprint.rectangle(float(rng.uniform(0.2, 1.0)),
                                 float(rng.uniform(0.2, 0.8)))
    pose = jnp.asarray(rng.uniform(-0.3, 0.3, 3), jnp.float32)
    vel = jnp.asarray(rng.uniform(-0.5, 0.5, 3), jnp.float32)

    for _ in range(5):
        out = eng.step(state, plan, pose, vel, cm, fp,
                       float(rng.uniform(0.01, 1.0)))
        state = out.state
        cmd = np.asarray(out.cmd_vel)
        assert np.all(np.isfinite(cmd)), (seed, cmd)
        # Either zeroed by a safety stop or inside the feasible set.
        if np.any(cmd != 0.0):
            assert cmd[0] <= cfg.max_vel_x + 1e-4
            assert cmd[0] >= cfg.min_vel_x - 1e-4
            assert abs(cmd[2]) <= max(abs(cfg.min_vel_theta),
                                      cfg.max_vel_theta) + 1e-4
        vel = out.cmd_vel
        pose = mpc.rollout(out.cmd_vel[None, :], jnp.float32(0.033), pose)[0]


@pytest.mark.parametrize("seed", [10, 11])
def test_rolling_view_fuzz(seed):
    """Randomized world/window geometry: the zero-copy rolling view must
    sample bit-identically to the materialized slice at arbitrary points —
    in-window, in the out-of-window band, below the origin, off the world —
    for every sampler the engine uses."""
    from neo_mpc_planner2_tpu.ops.costmap import (cost_at_world,
                                                  cost_at_world_bilinear,
                                                  cost_at_world_onehot)
    from neo_mpc_planner2_tpu.ops.footprint import line_cost_exact
    from neo_mpc_planner2_tpu.simulation import rolling_view, rolling_window

    rng = np.random.default_rng(seed)
    for _ in range(6):
        H = int(rng.integers(20, 90))
        W = int(rng.integers(20, 90))
        res = float(rng.choice([0.025, 0.05, 0.1]))
        origin = rng.uniform(-4, 2, 2)
        cells = int(rng.integers(8, min(H, W) + 1))
        world = mpc.Costmap.create(rng.random((H, W)),
                                   origin=tuple(origin),
                                   resolution=res).with_flat()
        span_x = (origin[0] - 2.0, origin[0] + W * res + 2.0)
        span_y = (origin[1] - 2.0, origin[1] + H * res + 2.0)
        pose = jnp.asarray([rng.uniform(*span_x), rng.uniform(*span_y), 0.0],
                           jnp.float32)
        win = rolling_window(world, pose, cells)
        view = rolling_view(world, pose, cells)
        wx = jnp.asarray(rng.uniform(*span_x, 128), jnp.float32)
        wy = jnp.asarray(rng.uniform(*span_y, 128), jnp.float32)
        for fn in (cost_at_world, cost_at_world_onehot,
                   cost_at_world_bilinear):
            np.testing.assert_array_equal(
                np.asarray(fn(view, wx, wy)), np.asarray(fn(win, wx, wy)),
                err_msg=f"{fn.__name__} H={H} W={W} cells={cells}")
        np.testing.assert_array_equal(
            np.asarray(line_cost_exact(view, wx[:16], wy[:16],
                                       wx[16:32], wy[16:32])),
            np.asarray(line_cost_exact(win, wx[:16], wy[:16],
                                       wx[16:32], wy[16:32])),
            err_msg=f"line_cost_exact H={H} W={W} cells={cells}")
