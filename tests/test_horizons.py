"""Generality over the horizon discretization: the reference hardcodes nothing
about control_steps=3 (it's a parameter, py:75); neither may we. Engine,
solver, and oracle must agree for other step counts and horizons."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.oracle import NpCostmap, NpScenario, OracleServer


@pytest.mark.parametrize("steps,horizon", [(1, 0.3), (5, 1.0), (8, 1.6)])
def test_solver_matches_oracle_other_horizons(cfg, empty_costmap, footprint,
                                              footprint_np, steps, horizon):
    c = cfg.replace(control_steps=steps, prediction_horizon=horizon,
                    opt_tolerance=1e-8)
    solver = jax.jit(mpc.make_sqp_solver(c, mpc.make_objective(c), ftol=1e-8,
                                         max_iters=300))
    scen = mpc.Scenario.create([0, 0, 0], [0.4, 0.1, 0.2], [1.0, 0.5, 0.3],
                               [0.3, 0, 0], footprint, empty_costmap)
    res = solver(jnp.zeros(3 * steps), scen)
    assert res.x.shape == (3 * steps,)

    npcm = NpCostmap(np.zeros((40, 40)), np.array([-1.0, -1.0]), 0.05)
    nps = NpScenario(np.zeros(3), np.array([0.4, 0.1, 0.2]),
                     np.array([1.0, 0.5, 0.3]), np.array([0.3, 0, 0]),
                     footprint_np, npcm)
    srv = OracleServer(c)
    _, diag = srv.solve(nps, 0.033)
    fgap = float(res.fun) - diag["fun"]
    dx = np.abs(diag["raw"] - np.asarray(res.x)).max()
    assert fgap < 1e-4, (steps, fgap)
    assert dx < 1e-2 or fgap < 2e-6, (steps, dx, fgap)


@pytest.mark.parametrize("steps", [1, 5])
def test_engine_tick_other_steps(cfg, empty_costmap, footprint, steps):
    c = cfg.replace(control_steps=steps)
    eng = mpc.MpcEngine(c)
    state = eng.init_state()
    assert state.initial_guess.shape == (3 * steps,)
    plan = mpc.Plan.create(
        np.stack([np.linspace(0, 2, 40), np.zeros(40), np.zeros(40)], 1),
        max_points=c.max_plan_points)
    out = eng.step(state, plan, jnp.zeros(3, jnp.float32),
                   jnp.asarray([0.3, 0, 0], jnp.float32), empty_costmap,
                   footprint, 0.033)
    assert out.local_plan.shape == (steps + 1, 3)
    assert np.all(np.isfinite(np.asarray(out.cmd_vel)))
    assert float(out.cmd_vel[0]) > 0.0


def test_hexagon_footprint(cfg, empty_costmap):
    """Non-rectangular footprints (max_footprint_vertices headroom)."""
    ang = np.linspace(0, 2 * np.pi, 7)[:-1]
    hexa = np.stack([0.35 * np.cos(ang), 0.35 * np.sin(ang)], 1)
    fp = mpc.Footprint.create(hexa, max_vertices=8)
    eng = mpc.MpcEngine(cfg)
    plan = mpc.Plan.create(
        np.stack([np.linspace(0, 2, 40), np.zeros(40), np.zeros(40)], 1),
        max_points=cfg.max_plan_points)
    out = eng.step(eng.init_state(), plan, jnp.zeros(3, jnp.float32),
                   jnp.asarray([0.3, 0, 0], jnp.float32), empty_costmap, fp,
                   0.033)
    assert np.all(np.isfinite(np.asarray(out.cmd_vel)))
    # Hexagon boundary at a lethal wall: cost trips.
    data = np.ones((40, 40))
    cml = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
    c = float(mpc.footprint_cost(cml, fp, samples=16))
    assert c == 1.0
