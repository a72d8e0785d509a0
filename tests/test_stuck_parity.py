"""Stuck-wait / collision sequence parity vs the oracle: the full §3.2 state
machine (collision latch, waiting-time accumulation, 3 s expiry, recovery)
must evolve tick-for-tick like the scipy reference when an obstacle appears
and then clears."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.engine import solve_step
from neo_mpc_planner2_tpu.oracle import NpCostmap, NpScenario, OracleServer


def _maps():
    clear = np.zeros((40, 40))
    blocked = np.zeros((40, 40))
    blocked[:, 28:] = 0.995  # high-but-not-lethal band at x > 0.4
    return clear, blocked


def test_stuck_sequence_matches_oracle(cfg, footprint, footprint_np):
    tight = cfg.replace(opt_tolerance=1e-8)
    solver = mpc.make_sqp_solver(tight, mpc.make_objective(tight), ftol=1e-8,
                                 max_iters=300)
    step = jax.jit(lambda st, sc, dt: solve_step(tight, st, sc, dt,
                                                 solver=solver))
    clear, blocked = _maps()
    origin = (-1.0, -1.0)

    srv = OracleServer(tight)
    state = mpc.init_state(tight)
    dt = 0.7  # big delta_t so the 3 s expiry happens within a few ticks

    # Phase plan: 3 clear ticks -> 6 blocked ticks (latch + wait + expiry
    # cycle) -> 4 clear ticks (recovery; latch must drop).
    phases = ["clear"] * 3 + ["blocked"] * 6 + ["clear"] * 4
    jax_flags, oracle_flags = [], []
    for i, phase in enumerate(phases):
        data = clear if phase == "clear" else blocked
        cm = mpc.Costmap.create(data, origin=origin, resolution=0.05)
        scen = mpc.Scenario.create([0, 0, 0], [0.6, 0.0, 0.0], [1.0, 0.0, 0.0],
                                   [0.5, 0, 0], footprint, cm,
                                   control_interval=1 / 30)
        out = step(state, scen, jnp.float32(dt))
        state = out.state

        nps = NpScenario(np.zeros(3), np.array([0.6, 0.0, 0.0]),
                         np.array([1.0, 0.0, 0.0]), np.array([0.5, 0, 0]),
                         footprint_np, NpCostmap(data, np.array(origin), 0.05),
                         control_interval=1 / 30)
        cmd_o, diag = srv.solve(nps, dt)

        np.testing.assert_allclose(np.asarray(out.cmd_vel), cmd_o, atol=8e-3,
                                   err_msg=f"tick {i} ({phase})")
        jax_flags.append(bool(out.collision))
        oracle_flags.append(bool(diag["collision"]))
        assert abs(float(state.waiting_time) - srv.waiting_time) < 1e-5, (
            i, phase, float(state.waiting_time), srv.waiting_time)

    assert jax_flags == oracle_flags
    # The sequence actually exercised the latch: blocked ticks had zero
    # commands, and the latch cycled through an expiry.
    assert any(jax_flags)
    assert not jax_flags[-1]


def test_goal_change_resets_match_oracle(cfg, empty_costmap, footprint,
                                         footprint_np):
    """New-goal reset parity (py:357-361): guesses and last_control reset on
    both sides; commands stay matched across the transition."""
    tight = cfg.replace(opt_tolerance=1e-8)
    solver = mpc.make_sqp_solver(tight, mpc.make_objective(tight), ftol=1e-8,
                                 max_iters=300)
    step = jax.jit(lambda st, sc, dt: solve_step(tight, st, sc, dt,
                                                 solver=solver))
    npcm = NpCostmap(np.zeros((40, 40)), np.array([-1.0, -1.0]), 0.05)
    srv = OracleServer(tight)
    state = mpc.init_state(tight)
    goals = [[1.0, 0.5, 0.3]] * 4 + [[-1.0, 0.8, 1.0]] * 4
    for i, goal in enumerate(goals):
        scen = mpc.Scenario.create([0, 0, 0], [0.4, 0.1, 0.2], goal,
                                   [0.3, 0, 0], footprint, empty_costmap,
                                   control_interval=1 / 30)
        out = step(state, scen, jnp.float32(1 / 30))
        state = out.state
        nps = NpScenario(np.zeros(3), np.array([0.4, 0.1, 0.2]),
                         np.array(goal, float), np.array([0.3, 0, 0]),
                         footprint_np, npcm, control_interval=1 / 30)
        cmd_o, _ = srv.solve(nps, 1 / 30)
        np.testing.assert_allclose(np.asarray(out.cmd_vel), cmd_o, atol=8e-3,
                                   err_msg=f"tick {i} goal={goal}")
