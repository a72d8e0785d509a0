"""Runtime Limits pytree: speed-limit / dynamic-reconfigure bound updates must
produce exactly the statically-configured behavior while reusing the already
compiled executable (VERDICT round-1 'retrace-free reconfigure')."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.controller import NeoMpcController
from neo_mpc_planner2_tpu.engine import solve_step
from neo_mpc_planner2_tpu.ops.objective import Limits
from neo_mpc_planner2_tpu.serving import OptimizerSession


def _line_plan(n=50, length=2.0):
    return np.stack([np.linspace(0, length, n), np.zeros(n), np.zeros(n)], 1)


def _scen(cfg, costmap, footprint, limits=None):
    return mpc.Scenario.create(
        [0.0, 0.0, 0.0], [0.6, 0.1, 0.0], [2.0, 0.0, 0.0], [0.2, 0.0, 0.0],
        footprint, costmap, control_interval=1 / 30, limits=limits)


class TestRuntimeLimitsParity:
    def test_runtime_equals_static(self, cfg, empty_costmap, footprint):
        """A solve with Limits(r/2) must equal a solve statically configured
        at r/2 — same bounds, same cone, same clamp."""
        half = cfg.replace(max_vel_x=0.35, min_vel_x=-0.35, max_vel_y=0.35,
                           min_vel_y=-0.35, max_vel_trans=0.35)
        out_static = jax.jit(lambda st, sc: solve_step(
            half, st, sc, jnp.float32(1 / 30)))(
            mpc.init_state(half), _scen(half, empty_costmap, footprint))

        lim = Limits.from_config(half)
        out_runtime = jax.jit(lambda st, sc: solve_step(
            cfg, st, sc, jnp.float32(1 / 30)))(
            mpc.init_state(cfg), _scen(cfg, empty_costmap, footprint, lim))

        np.testing.assert_allclose(np.asarray(out_runtime.cmd_vel),
                                   np.asarray(out_static.cmd_vel), atol=2e-6)
        np.testing.assert_allclose(np.asarray(out_runtime.raw_solution),
                                   np.asarray(out_static.raw_solution),
                                   atol=2e-6)

    def test_bounds_actually_bind(self, cfg, empty_costmap, footprint):
        lim = Limits.from_config(cfg).scaled(0.3)
        out = jax.jit(lambda st, sc: solve_step(
            cfg, st, sc, jnp.float32(1 / 30)))(
            mpc.init_state(cfg), _scen(cfg, empty_costmap, footprint, lim))
        raw = np.asarray(out.raw_solution).reshape(-1, 3)
        # Box bounds are exact (clip); the cone is ADMM-enforced to ~1e-3,
        # matching the static-config path's accuracy.
        assert np.all(np.abs(raw) <= 0.3 * 0.7 + 1e-6)
        assert np.all(np.linalg.norm(raw[:, :2], axis=1)
                      <= 0.3 * cfg.max_vel_trans + 2e-3)


class TestSpeedLimitNoRetrace:
    def test_engine_not_rebuilt(self, cfg, empty_costmap, footprint):
        c = NeoMpcController()
        c.configure(cfg, costmap=empty_costmap, footprint=footprint)
        c.activate()
        c.set_plan(_line_plan())
        c.compute_velocity_commands([0, 0, 0], [0, 0, 0], 1 / 30)
        engine_before = c._engine
        c.set_speed_limit(50.0, percentage=True)
        assert c._engine is engine_before  # no rebuild, hence no retrace
        assert c.cfg.max_vel_trans == pytest.approx(cfg.max_vel_trans * 0.5)
        # Drive a few ticks: speed must respect the halved cone.
        vel = np.zeros(3)
        for _ in range(12):
            vel = c.compute_velocity_commands([0.2, 0, 0], vel, 1 / 30)
        assert np.linalg.norm(vel[:2]) <= cfg.max_vel_trans * 0.5 + 1e-4

    def test_second_change_reuses_cache(self, cfg, empty_costmap, footprint):
        c = NeoMpcController()
        c.configure(cfg, costmap=empty_costmap, footprint=footprint)
        c.activate()
        c.set_plan(_line_plan())
        c.set_speed_limit(50.0, percentage=True)
        c.compute_velocity_commands([0, 0, 0], [0, 0, 0], 1 / 30)
        import time

        c.set_speed_limit(25.0, percentage=True)
        t0 = time.perf_counter()
        c.compute_velocity_commands([0, 0, 0], [0, 0, 0], 1 / 30)
        warm_ms = (time.perf_counter() - t0) * 1e3
        # A retrace would cost seconds on any backend; warm reuse is fast.
        assert warm_ms < 1000.0


class TestServingRuntimeReconfigure:
    def _mk(self, cfg):
        s = OptimizerSession(cfg)
        s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                  "origin": [-1, -1], "resolution": 0.05})
        s.handle({"op": "set_footprint",
                  "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
        return s

    def _req(self):
        return {"op": "optimizer", "current_pose": [0, 0, 0],
                "carrot_pose": [0.6, 0.1, 0.0], "goal_pose": [2, 0, 0],
                "current_vel": [0.2, 0, 0], "control_interval": 1 / 30,
                "delta_t": 1 / 30}

    def test_weight_update_no_retrace_and_takes_effect(self, cfg):
        s = self._mk(cfg)
        r = s.handle({"op": "configure", "params": {"w_trans": 0.11}})
        assert r["retraced"] is False
        assert s.cfg.w_trans == 0.11
        # Same weights via a fresh statically-configured session agree.
        out_a = s.handle(self._req())
        s2 = self._mk(cfg.replace(w_trans=0.11))
        out_b = s2.handle(self._req())
        np.testing.assert_allclose(out_a["output_vel"], out_b["output_vel"],
                                   atol=2e-6)

    def test_bound_update_no_retrace(self, cfg):
        s = self._mk(cfg)
        r = s.handle({"op": "configure",
                      "params": {"max_vel_trans": 0.3, "max_vel_x": 0.3,
                                 "max_vel_y": 0.3}})
        assert r["retraced"] is False
        out = s.handle(self._req())
        v = np.asarray(out["output_vel"])
        assert np.linalg.norm(v[:2]) <= 0.3 + 1e-4

    def test_structural_update_retraces(self, cfg):
        s = self._mk(cfg)
        r = s.handle({"op": "configure", "params": {"prediction_horizon": 1.2}})
        assert r["retraced"] is True
        assert s.cfg.prediction_horizon == 1.2
