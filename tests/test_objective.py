"""Objective parity: the device cost function must match the oracle objective
(the quirk-faithful re-implementation of mpc_optimization_server.py:204-269)
to float32 precision on randomized scenarios — including lethal-cell and
footprint-collision branches."""

import numpy as np
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.oracle import NpCostmap, NpScenario, oracle_objective


def _random_scenario(rng, cfg, footprint_np, lethal_cells=0):
    data = rng.uniform(0.0, 0.9, (40, 40))
    if lethal_cells:
        ys = rng.integers(0, 40, lethal_cells)
        xs = rng.integers(0, 40, lethal_cells)
        data[ys, xs] = 1.0
    origin = np.array([-1.0, -1.0])
    res = 0.05
    cur = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3), rng.uniform(-3, 3)])
    carrot = np.array([rng.uniform(-0.6, 0.6), rng.uniform(-0.6, 0.6), rng.uniform(-2, 2)])
    goal = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(-3, 3)])
    vel = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5)])

    nps = NpScenario(cur, carrot, goal, vel, footprint_np,
                     NpCostmap(data, origin, res))
    cm = mpc.Costmap.create(data, origin=tuple(origin), resolution=res)
    scen = mpc.Scenario.create(cur, carrot, goal, vel,
                               mpc.Footprint.create(footprint_np), cm)
    return nps, scen


@pytest.mark.parametrize("lethal_cells", [0, 30])
def test_objective_matches_oracle(cfg, footprint_np, lethal_cells):
    rng = np.random.default_rng(42 + lethal_cells)
    obj = mpc.make_objective(cfg, parity=True)
    for _ in range(10):
        nps, scen = _random_scenario(rng, cfg, footprint_np, lethal_cells)
        u = rng.uniform(-0.7, 0.7, 3 * cfg.control_steps)
        want = oracle_objective(u, nps, cfg)
        got = float(obj(jnp.asarray(u, jnp.float32), scen))
        assert got == pytest.approx(want, rel=2e-4, abs=2e-4)


def test_footprint_collision_branch(cfg, footprint_np):
    """When the current footprint touches a lethal cell the w_footprint term
    fires identically on both sides (py:262-263)."""
    cfg = cfg.replace(w_footprint=2000.0)
    data = np.zeros((40, 40))
    # Robot at x=0.01 puts the front footprint edge at x=0.31, mid-cell of
    # column 26 — robust to float truncation at cell boundaries.
    data[20, 26] = 1.0
    origin = np.array([-1.0, -1.0])
    cur = np.array([0.01, 0.0, 0.0])
    nps = NpScenario(cur, np.array([0.4, 0.1, 0.2]),
                     np.array([1.0, 0.5, 0.3]), np.zeros(3), footprint_np,
                     NpCostmap(data, origin, 0.05))
    cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
    scen = mpc.Scenario.create(cur, [0.4, 0.1, 0.2], [1.0, 0.5, 0.3],
                               np.zeros(3), mpc.Footprint.create(footprint_np), cm)
    u = np.full(9, 0.1)
    want = oracle_objective(u, nps, cfg)
    got = float(mpc.make_objective(cfg)(jnp.asarray(u, jnp.float32), scen))
    assert got == pytest.approx(want, rel=1e-4)
    # And the term actually fired (cost should exceed w_footprint).
    assert want > 1000.0


def test_buggy_odom_yaw_formula():
    """py:213 quirk: quaternion mixing reproduces the reference formula."""
    from neo_mpc_planner2_tpu.ops.objective import buggy_odom_yaw
    from neo_mpc_planner2_tpu.oracle import _buggy_yaw

    for cy, gy in [(0.3, 1.2), (-2.0, 0.5), (3.0, -3.0), (0.0, 0.0)]:
        assert float(buggy_odom_yaw(jnp.float32(cy), jnp.float32(gy))) == \
            pytest.approx(_buggy_yaw(cy, gy), abs=1e-6)
        # ...and differs from the true yaw in general.
    assert abs(_buggy_yaw(0.3, 1.2) - 0.3) > 1e-3


def test_compat_flag_disables_buggy_yaw(cfg, empty_costmap, footprint):
    import dataclasses

    compat_off = dataclasses.replace(cfg.compat, buggy_odom_yaw=False)
    cfg_fixed = cfg.replace(compat=compat_off)
    scen = mpc.Scenario.create([0.5, 0.5, 1.0], [0.4, 0.1, 0.2],
                               [1.0, 0.5, 2.5], [0.2, 0.0, 0.0],
                               footprint, empty_costmap)
    u = jnp.asarray(np.full(9, 0.4), jnp.float32)
    # The yaw quirk only shows through the costmap term (it seeds the odom
    # rollout); use a map where every cell differs so the diverging
    # trajectories almost surely sample different costs.
    data = np.random.default_rng(9).uniform(0.0, 0.9, (40, 40))
    cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
    scen = scen.replace(costmap=cm)
    v_buggy = float(mpc.make_objective(cfg)(u, scen))
    v_fixed = float(mpc.make_objective(cfg_fixed)(u, scen))
    assert v_buggy != v_fixed


def test_compat_flags_wired(cfg, empty_costmap, footprint):
    """no_angle_wrap and unsquared_control_cost must actually change the
    objective when toggled."""
    import dataclasses

    scen = mpc.Scenario.create([0, 0, 0], [0.4, 0.1, 3.0], [1, 0.5, 0.3],
                               [0.3, 0.2, 0.1], footprint, empty_costmap)
    u = jnp.asarray(np.full(9, 0.25), jnp.float32)
    base = float(mpc.make_objective(cfg)(u, scen))

    wrap_cfg = cfg.replace(compat=dataclasses.replace(cfg.compat,
                                                      no_angle_wrap=False))
    assert float(mpc.make_objective(wrap_cfg)(u, scen)) != base

    sq_cfg = cfg.replace(compat=dataclasses.replace(
        cfg.compat, unsquared_control_cost=False))
    assert float(mpc.make_objective(sq_cfg)(u, scen)) != base
    # Squared-control solver path still works (smooth route).
    res = mpc.make_solver(sq_cfg, mpc.make_objective(sq_cfg), ftol=1e-8,
                          max_iters=300)(jnp.zeros(9), scen)
    assert np.all(np.isfinite(np.asarray(res.x)))
