"""Engine tests: the full solve_step post-processing chain vs the oracle server
(low-pass → collision/stuck-wait → accel clamp → warm start, SURVEY.md §3.2),
plus state-machine behaviors (goal reset, stuck timer, lethal gate)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.engine import solve_step
from neo_mpc_planner2_tpu.oracle import NpCostmap, NpScenario, OracleServer


@pytest.fixture(scope="module")
def jit_solve_step():
    cache = {}

    def get(cfg):
        if cfg not in cache:
            solver = mpc.make_sqp_solver(cfg, mpc.make_objective(cfg),
                                         ftol=1e-8, max_iters=300)

            def step(state, scen, dt):
                return solve_step(cfg, state, scen, dt, solver=solver)

            cache[cfg] = jax.jit(step)
        return cache[cfg]

    return get


def _tick_inputs(rng, t):
    """A smooth pseudo-trajectory of solve requests (fixed inputs, both stacks
    keep their own warm-start state)."""
    carrot = np.array([0.4 + 0.05 * np.sin(0.3 * t), 0.1 * np.cos(0.2 * t),
                       0.3 * np.sin(0.1 * t)])
    cur = np.array([0.02 * t, 0.01 * t, 0.05 * np.sin(0.2 * t)])
    vel = np.array([0.3 + 0.1 * np.sin(0.5 * t), 0.05 * np.cos(0.4 * t),
                    0.1 * np.sin(0.3 * t)])
    goal = np.array([2.0, 1.0, 0.5])
    return cur, carrot, goal, vel


class TestSolveStepParity:
    def test_command_sequence_matches_oracle(self, cfg, empty_costmap, footprint,
                                             footprint_np, jit_solve_step):
        tight = cfg.replace(opt_tolerance=1e-8)
        step = jit_solve_step(tight)
        npcm = NpCostmap(np.zeros((40, 40)), np.array([-1.0, -1.0]), 0.05)
        srv = OracleServer(tight)
        state = mpc.init_state(tight)
        rng = np.random.default_rng(0)
        dt = 1.0 / tight.controller_frequency

        for t in range(25):
            cur, carrot, goal, vel = _tick_inputs(rng, t)
            scen = mpc.Scenario.create(cur, carrot, goal, vel, footprint,
                                       empty_costmap)
            out = step(state, scen, jnp.float32(dt))
            state = out.state
            nps = NpScenario(cur, carrot, goal, vel, footprint_np, npcm)
            cmd_oracle, diag = srv.solve(nps, dt)
            np.testing.assert_allclose(np.asarray(out.cmd_vel), cmd_oracle,
                                       atol=8e-3,
                                       err_msg=f"tick {t}: {diag}")

    def test_goal_change_resets_state(self, cfg, empty_costmap, footprint,
                                      jit_solve_step):
        step = jit_solve_step(cfg)
        state = mpc.init_state(cfg)
        scen = mpc.Scenario.create([0, 0, 0], [0.4, 0.1, 0.2], [1.0, 0.5, 0.3],
                                   [0.3, 0, 0], footprint, empty_costmap)
        out1 = step(state, scen, jnp.float32(0.033))
        state = out1.state
        assert bool(state.has_old_goal)
        # Same goal: warm start persists (non-zero guess).
        out2 = step(state, scen, jnp.float32(0.033))
        # New goal: last_control and guess reset before the solve; the
        # acceleration clamp then binds around 0 instead of the previous cmd.
        scen_new = scen.replace(goal_pose=jnp.asarray([9.0, 9.0, 1.0], jnp.float32))
        out3 = step(out2.state, scen_new, jnp.float32(0.033))
        lim = np.array([cfg.acc_x_limit, cfg.acc_y_limit, cfg.acc_theta_limit])
        assert np.all(np.abs(np.asarray(out3.cmd_vel))
                      <= lim * cfg.control_interval + 1e-5)

    def test_accel_clamp_binds(self, cfg, empty_costmap, footprint, jit_solve_step):
        step = jit_solve_step(cfg)
        state = mpc.init_state(cfg)
        # Far carrot straight ahead: solver wants max speed; first command is
        # clamped to acc_x_limit * control_interval from last_control=0.
        scen = mpc.Scenario.create([0, 0, 0], [3.0, 0.0, 0.0], [5.0, 0.0, 0.0],
                                   [0.0, 0, 0], footprint, empty_costmap)
        out = step(state, scen, jnp.float32(0.033))
        assert float(out.cmd_vel[0]) <= cfg.acc_x_limit * cfg.control_interval + 1e-5

    def test_collision_zeroes_and_stuck_wait(self, cfg, footprint, jit_solve_step):
        # High-but-not-lethal band ahead (cost 0.995): cheap in the objective
        # (no ×1000 branch, no footprint hit) so the solver drives through it,
        # but the collision check trips its >= 0.99 threshold (py:338).
        data = np.zeros((40, 40))
        data[:, 28:] = 0.995  # band for x > ~0.4 (origin -1, res 0.05)
        cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
        step = jit_solve_step(cfg)
        state = mpc.init_state(cfg)
        scen = mpc.Scenario.create([0, 0, 0], [0.6, 0.0, 0.0], [1.0, 0.0, 0.0],
                                   [0.5, 0, 0], footprint, cm)
        out = step(state, scen, jnp.float32(0.5))
        assert bool(out.collision)
        np.testing.assert_allclose(np.asarray(out.cmd_vel), 0.0)
        # waiting_time accumulates only from the second blocked tick onward
        # (first tick accumulates from the same-goal branch start value 0...
        # actually from 0 + delta_t).
        state = out.state
        assert float(state.waiting_time) == pytest.approx(0.5)
        # After cumulative 3 s the latch clears (py:380) but the command stays
        # zero on the expiring tick.
        for _ in range(5):
            out = step(state, scen, jnp.float32(0.7))
            state = out.state
        assert float(state.waiting_time) < 3.0  # reset happened
        # Latch cleared after expiry: collision recomputed fresh each tick —
        # the wall is still there, so it re-latches, but waiting_time restarted.
        assert bool(state.collision)

    def test_product_mode_honors_waiting_time(self, cfg, footprint,
                                              jit_solve_step):
        """With compat.hardcoded_stuck_wait off, cfg.waiting_time is the
        stuck-wait threshold (the parameter's documented meaning, py:70);
        parity mode keeps the reference's hardcoded 3.0 s (py:380)."""
        import dataclasses

        data = np.zeros((40, 40))
        data[:, 28:] = 0.995
        cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
        scen = mpc.Scenario.create([0, 0, 0], [0.6, 0.0, 0.0],
                                   [1.0, 0.0, 0.0], [0.5, 0, 0], footprint, cm)

        def ticks_to_expiry(c):
            step = jit_solve_step(c)
            state = mpc.init_state(c)
            for tick in range(1, 12):
                out = step(state, scen, jnp.float32(0.5))
                state = out.state
                # Expiry tick: the accumulator just reset below one delta_t.
                if float(state.waiting_time) < 0.5:
                    return tick
            return None

        # Parity: threshold 3.0 => waiting_time hits 3.0 on tick 6
        # (ignores cfg.waiting_time entirely).
        assert ticks_to_expiry(cfg.replace(waiting_time=1.0)) == 6
        product = cfg.replace(
            waiting_time=1.0,
            compat=dataclasses.replace(cfg.compat, hardcoded_stuck_wait=False))
        # Product: threshold 1.0 => expiry on tick 2.
        assert ticks_to_expiry(product) == 2

    def test_footprint_collision_blocks(self, cfg, footprint, jit_solve_step):
        data = np.zeros((40, 40))
        data[20, 26] = 1.0  # cell x∈[0.30,0.35): front edge of the footprint
        cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
        cfg64 = cfg.replace(footprint_edge_samples=64)
        step = jit_solve_step(cfg64)
        state = mpc.init_state(cfg64)
        # Robot at x=0.01 so the front edge (x=0.31) lands mid-cell — avoids
        # float truncation landing exactly on the cell boundary.
        scen = mpc.Scenario.create([0.01, 0, 0], [0.4, 0.0, 0.0], [1.0, 0.0, 0.0],
                                   [0.0, 0, 0], footprint, cm)
        out = step(state, scen, jnp.float32(0.033))
        assert bool(out.collision_footprint)
        np.testing.assert_allclose(np.asarray(out.cmd_vel), 0.0)

    def test_warm_start_shift_on_convergence(self, cfg, empty_costmap, footprint,
                                             jit_solve_step):
        step = jit_solve_step(cfg)
        state = mpc.init_state(cfg)
        scen = mpc.Scenario.create([0, 0, 0], [0.4, 0.1, 0.2], [1.0, 0.5, 0.3],
                                   [0.3, 0, 0], footprint, empty_costmap)
        out = step(state, scen, jnp.float32(0.033))
        assert bool(out.solver_converged)
        x = np.asarray(out.raw_solution)
        # Low-passed first control:
        first = x[:3] * cfg.low_pass_gain  # last_control was 0
        guess = np.asarray(out.state.initial_guess).reshape(-1, 3)
        np.testing.assert_allclose(guess[-1], first, atol=1e-6)
        np.testing.assert_allclose(guess[0], x[3:6], atol=1e-6)


class TestControllerStep:
    def test_full_tick_runs_and_moves_forward(self, cfg, empty_costmap, footprint):
        eng = mpc.MpcEngine(cfg)
        state = eng.init_state()
        plan = mpc.Plan.create(
            np.stack([np.linspace(0, 2, 50), np.zeros(50), np.zeros(50)], axis=1),
            max_points=cfg.max_plan_points)
        out = eng.step(state, plan, jnp.asarray([0.0, 0.0, 0.0], jnp.float32),
                       jnp.asarray([0.3, 0.0, 0.0], jnp.float32),
                       empty_costmap, footprint, 0.033)
        assert not bool(out.lethal)
        assert float(out.cmd_vel[0]) > 0.0
        assert abs(float(out.cmd_vel[1])) < 0.1

    def test_lethal_zeroes_command(self, cfg, footprint):
        data = np.ones((40, 40))
        cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
        eng = mpc.MpcEngine(cfg)
        state = eng.init_state()
        plan = mpc.Plan.create(
            np.stack([np.linspace(0, 2, 20), np.zeros(20), np.zeros(20)], axis=1),
            max_points=cfg.max_plan_points)
        out = eng.step(state, plan, jnp.zeros(3, jnp.float32),
                       jnp.asarray([0.3, 0.0, 0.0], jnp.float32), cm, footprint, 0.033)
        assert bool(out.lethal)
        np.testing.assert_allclose(np.asarray(out.cmd_vel), 0.0)

    def test_batched_step(self, cfg, empty_costmap, footprint):
        eng = mpc.MpcEngine(cfg)
        B = 4
        state = eng.init_batch_state(B)
        plan_np = np.stack([np.linspace(0, 2, 50), np.zeros(50), np.zeros(50)], axis=1)
        plan1 = mpc.Plan.create(plan_np, max_points=cfg.max_plan_points)
        plans = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), plan1)
        poses = jnp.zeros((B, 3), jnp.float32)
        vels = jnp.tile(jnp.asarray([0.3, 0.0, 0.0], jnp.float32), (B, 1))
        cms = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), empty_costmap)
        fps = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), footprint)
        dts = jnp.full((B,), 0.033, jnp.float32)
        out = eng.batch_step(state, plans, poses, vels, cms, fps, dts)
        assert out.cmd_vel.shape == (B, 3)
        # Identical scenarios -> identical commands.
        np.testing.assert_allclose(out.cmd_vel[0], out.cmd_vel[1], atol=1e-6)
