"""Edge-of-envelope configurations: degenerate weights, asymmetric bounds,
MPO-500 footprint, tiny/huge maps — nothing may NaN, violate constraints, or
diverge from the oracle where the oracle is defined."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.oracle import NpCostmap, NpScenario, OracleServer
from neo_mpc_planner2_tpu.scenarios import mpo500_footprint


def _solve(cfg, scen, warm=None):
    solver = jax.jit(mpc.make_sqp_solver(cfg, mpc.make_objective(cfg),
                                         ftol=1e-8, max_iters=300))
    x0 = jnp.zeros(3 * cfg.control_steps) if warm is None else warm
    return solver(x0, scen)


class TestDegenerateWeights:
    def test_all_zero_weights(self, cfg, empty_costmap, footprint):
        z = cfg.replace(w_trans=0.0, w_orient=0.0, w_control=0.0,
                        w_terminal=0.0, w_costmap=0.0, w_footprint=0.0)
        scen = mpc.Scenario.create([0, 0, 0], [0.4, 0.1, 0.2], [1, 0.5, 0.3],
                                   [0.3, 0, 0], footprint, empty_costmap)
        res = _solve(z, scen)
        assert np.all(np.isfinite(np.asarray(res.x)))
        assert float(res.fun) == 0.0

    def test_huge_control_weight_pins_to_velocity(self, cfg, empty_costmap,
                                                  footprint):
        z = cfg.replace(w_control=100.0)
        v = [0.2, -0.1, 0.05]
        scen = mpc.Scenario.create([0, 0, 0], [0.4, 0.1, 0.2], [1, 0.5, 0.3],
                                   v, footprint, empty_costmap)
        res = _solve(z, scen)
        np.testing.assert_allclose(np.asarray(res.x).reshape(-1, 3),
                                   np.tile(v, (cfg.control_steps, 1)),
                                   atol=5e-3)


class TestAsymmetricBounds:
    def test_forward_only_robot(self, cfg, empty_costmap, footprint,
                                footprint_np):
        """min_vel_x = 0 (differential-like limits): both solvers respect it
        and still agree."""
        c = cfg.replace(min_vel_x=0.0, min_vel_y=-0.2, max_vel_y=0.2,
                        opt_tolerance=1e-8)
        scen = mpc.Scenario.create([0, 0, 0], [-0.5, 0.1, 0.0], [1, 0, 0],
                                   [0.1, 0, 0], footprint, empty_costmap)
        res = _solve(c, scen)
        u = np.asarray(res.x).reshape(-1, 3)
        assert np.all(u[:, 0] >= -1e-6)  # cannot reverse
        assert np.all(np.abs(u[:, 1]) <= 0.2 + 1e-5)
        srv = OracleServer(c)
        nps = NpScenario(np.zeros(3), np.array([-0.5, 0.1, 0.0]),
                         np.array([1.0, 0, 0]), np.array([0.1, 0, 0]),
                         footprint_np, NpCostmap(np.zeros((40, 40)),
                                                 np.array([-1.0, -1.0]), 0.05))
        _, diag = srv.solve(nps, 0.033)
        assert float(res.fun) - diag["fun"] < 1e-4


class TestFootprints:
    def test_mpo500(self, cfg, empty_costmap):
        eng = mpc.MpcEngine(cfg)
        plan = mpc.Plan.create(
            np.stack([np.linspace(0, 2, 40), np.zeros(40), np.zeros(40)], 1),
            max_points=cfg.max_plan_points)
        out = eng.step(eng.init_state(), plan, jnp.zeros(3, jnp.float32),
                       jnp.asarray([0.3, 0, 0], jnp.float32), empty_costmap,
                       mpo500_footprint(), 0.033)
        assert np.all(np.isfinite(np.asarray(out.cmd_vel)))


class TestMaps:
    def test_tiny_map(self, cfg, footprint):
        cm = mpc.Costmap.create(np.zeros((8, 8)), origin=(-0.2, -0.2),
                                resolution=0.05)
        eng = mpc.MpcEngine(cfg)
        plan = mpc.Plan.create(
            np.stack([np.linspace(0, 0.3, 10), np.zeros(10), np.zeros(10)], 1),
            max_points=cfg.max_plan_points)
        out = eng.step(eng.init_state(), plan, jnp.zeros(3, jnp.float32),
                       jnp.zeros(3, jnp.float32), cm, footprint, 0.033)
        # Footprint extends beyond the tiny map -> out-of-bounds is lethal.
        assert bool(out.lethal) or bool(out.collision_footprint)

    def test_nonsquare_map(self, cfg, footprint):
        cm = mpc.Costmap.create(np.zeros((30, 90)), origin=(-0.5, -0.75),
                                resolution=0.05)
        eng = mpc.MpcEngine(cfg)
        plan = mpc.Plan.create(
            np.stack([np.linspace(0, 2, 40), np.zeros(40), np.zeros(40)], 1),
            max_points=cfg.max_plan_points)
        out = eng.step(eng.init_state(), plan, jnp.zeros(3, jnp.float32),
                       jnp.asarray([0.2, 0, 0], jnp.float32), cm, footprint,
                       0.033)
        assert np.all(np.isfinite(np.asarray(out.cmd_vel)))
        assert float(out.cmd_vel[0]) > 0
