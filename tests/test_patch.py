"""Solver costmap patch (round-2 perf lever): the per-solve window must be a
bit-exact drop-in for full-map nearest-cell sampling everywhere the solver can
reach, including map edges and off-map robots."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.engine import solve_step
from neo_mpc_planner2_tpu.ops.costmap import (
    cost_at_world, extract_patch, patch_cost_at_world,
    required_patch_halfwidth)
from neo_mpc_planner2_tpu.scenarios import make_scenario_batch


class TestPatchSampling:
    def test_bit_identical_within_bound(self):
        rng = np.random.default_rng(0)
        data = rng.uniform(0, 1, (48, 48)).astype(np.float32)
        cm = mpc.Costmap.create(data, origin=(-1.2, -1.2), resolution=0.05)
        h = 12
        for trial in range(50):
            # Centers anywhere, including off-map.
            cx, cy = rng.uniform(-2.0, 2.0, 2)
            patch = extract_patch(cm, jnp.float32(cx), jnp.float32(cy), h)
            # Sample points within the physics reach (h-1 cells).
            r = (h - 1) * 0.05
            pts = rng.uniform(-r, r, (16, 2)) + [cx, cy]
            wx = jnp.asarray(pts[:, 0], jnp.float32)
            wy = jnp.asarray(pts[:, 1], jnp.float32)
            got = patch_cost_at_world(cm, patch, wx, wy)
            want = cost_at_world(cm, wx, wy)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_lethal_preserved_exactly(self):
        """The ==1.0 branches depend on exact lethal propagation through the
        one-hot contraction."""
        data = np.zeros((32, 32), np.float32)
        data[10, 10] = 1.0
        cm = mpc.Costmap.create(data, origin=(0.0, 0.0), resolution=0.1)
        patch = extract_patch(cm, jnp.float32(1.0), jnp.float32(1.0), 8)
        v = patch_cost_at_world(cm, patch, jnp.asarray([1.05]), jnp.asarray([1.05]))
        assert float(v[0]) == 1.0

    def test_required_halfwidth(self, cfg):
        h = required_patch_halfwidth(cfg, 0.05)
        # sqrt(0.7² + 0.7²) * 0.8 / 0.05 = 15.84 -> 16 + 1
        assert h == 17


class TestPatchedSolveParity:
    @pytest.mark.parametrize("seed", [0, 5])
    def test_solve_identical_with_patch(self, cfg, seed):
        h = required_patch_halfwidth(cfg, 0.05)
        cfg_p = cfg.replace(solver_costmap_patch=h)
        sb = make_scenario_batch(cfg, 8, seed=seed, map_size=48,
                                 plan_points=24, lethal_threshold=0.8,
                                 pose_jitter=0.4)

        def run(c):
            solver = mpc.make_sqp_solver(c, mpc.make_objective(c))

            def one(state, pose, vel, cm, fp):
                scen = mpc.Scenario.create(pose, [0.5, 0.1, 0.0],
                                           [2.0, 0.0, 0.0], vel, fp, cm,
                                           control_interval=1 / 30)
                return solve_step(c, state, scen, jnp.float32(1 / 30),
                                  solver=solver)

            return jax.jit(jax.vmap(one))(
                sb.state, sb.robot_pose, sb.current_vel, sb.costmap,
                sb.footprint)

        base = run(cfg)
        patched = run(cfg_p)
        np.testing.assert_array_equal(np.asarray(base.raw_solution),
                                      np.asarray(patched.raw_solution))
        np.testing.assert_array_equal(np.asarray(base.cmd_vel),
                                      np.asarray(patched.cmd_vel))
        np.testing.assert_array_equal(np.asarray(base.solver_iters),
                                      np.asarray(patched.solver_iters))

    def test_robot_off_map(self, cfg, footprint):
        """Off-map robot: every sample is lethal on both paths."""
        h = required_patch_halfwidth(cfg, 0.05)
        cm = mpc.Costmap.create(np.zeros((40, 40), np.float32),
                                origin=(-1.0, -1.0), resolution=0.05)
        scen = mpc.Scenario.create([5.0, 5.0, 0.0], [0.5, 0.0, 0.0],
                                   [6.0, 5.0, 0.0], [0.1, 0.0, 0.0],
                                   footprint, cm, control_interval=1 / 30)

        def run(c):
            solver = mpc.make_sqp_solver(c, mpc.make_objective(c))
            return jax.jit(lambda st, sc: solve_step(
                c, st, sc, jnp.float32(1 / 30), solver=solver))(
                mpc.init_state(c), scen)

        base = run(cfg)
        patched = run(cfg.replace(solver_costmap_patch=h))
        np.testing.assert_array_equal(np.asarray(base.raw_solution),
                                      np.asarray(patched.raw_solution))
