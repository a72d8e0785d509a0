"""Pure-pursuit geometry tests: plan pruning, carrot selection, hysteresis —
the state-machine behaviors of NeoMpcPlanner.cpp:66-236 (SURVEY.md §4
controller state-machine tests)."""

import numpy as np
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.ops.pursuit import pursuit_tick, SLOW_DOWN_COST_GATE


def _line_plan(cfg, length=2.0, n=50, yaw=0.0):
    xs = np.linspace(0, length, n)
    return mpc.Plan.create(
        np.stack([xs, np.zeros(n), np.full(n, yaw)], axis=1),
        max_points=cfg.max_plan_points)


def _tick(cfg, plan, robot, cm, fp, start=0, slow_down=False):
    return pursuit_tick(cfg, plan, jnp.int32(start), jnp.asarray(slow_down),
                        jnp.asarray(robot, jnp.float32), cm, fp)


class TestCarrotSelection:
    def test_carrot_at_lookahead_distance(self, cfg, empty_costmap, footprint):
        plan = _line_plan(cfg)
        r = _tick(cfg, plan, [0.0, 0.0, 0.0], empty_costmap, footprint)
        # First pose >= 0.4 m ahead (cpp:178-188).
        d = float(np.hypot(r.carrot_pose[0], r.carrot_pose[1]))
        assert d >= cfg.lookahead_dist_max
        assert d < cfg.lookahead_dist_max + 0.06  # one plan-spacing slack

    def test_carrot_in_base_frame(self, cfg, empty_costmap, footprint):
        # Robot rotated 90°: a plan straight +x appears at -y in base frame.
        plan = _line_plan(cfg)
        r = _tick(cfg, plan, [0.0, 0.0, np.pi / 2], empty_costmap, footprint)
        assert float(r.carrot_pose[1]) < -0.3
        assert abs(float(r.carrot_pose[0])) < 0.05

    def test_short_plan_takes_last_pose(self, cfg, empty_costmap, footprint):
        plan = _line_plan(cfg, length=0.2, n=5)
        r = _tick(cfg, plan, [0.0, 0.0, 0.0], empty_costmap, footprint)
        np.testing.assert_allclose(float(r.carrot_pose[0]), 0.2, atol=1e-5)

    def test_closer_to_goal(self, cfg, empty_costmap, footprint):
        plan = _line_plan(cfg, length=2.0)
        far = _tick(cfg, plan, [0.0, 0.0, 0.0], empty_costmap, footprint)
        near = _tick(cfg, plan, [1.9, 0.0, 0.0], empty_costmap, footprint)
        assert not bool(far.closer_to_goal)
        assert bool(near.closer_to_goal)

    def test_consumed_prefix_advances(self, cfg, empty_costmap, footprint):
        plan = _line_plan(cfg)
        r = _tick(cfg, plan, [1.0, 0.0, 0.0], empty_costmap, footprint)
        assert int(r.new_start) > 20  # closest pose ~ index 25 of 50 over 2 m

    def test_window_limited_by_costmap_extent(self, cfg, footprint):
        # Tiny costmap: half-extent 0.25 m => carrot cannot be further than
        # that window's last pose even though lookahead is 0.4.
        cm = mpc.Costmap.create(np.zeros((10, 10)), origin=(-0.25, -0.25),
                                resolution=0.05)
        plan = _line_plan(cfg)
        r = _tick(cfg, plan, [0.0, 0.0, 0.0], cm, footprint)
        assert float(r.carrot_pose[0]) <= 0.3 + 1e-5

    def test_window_indices(self, cfg, empty_costmap, footprint):
        """window_begin/window_end bound the transformed-plan window
        (received_global_plan, cpp:102-128): begin at the closest pose,
        end at the first pose beyond half the costmap extent."""
        plan = _line_plan(cfg)  # 2 m, 50 poses, spacing ~0.0408 m
        r = _tick(cfg, plan, [1.0, 0.0, 0.0], empty_costmap, footprint)
        b, e = int(r.window_begin), int(r.window_end)
        assert b == int(r.new_start)
        poses = np.asarray(plan.poses)
        # Every window pose within the half-extent (40*0.05/2 = 1 m of robot),
        # and the pose at `e` (if any) beyond it.
        d = np.hypot(poses[:, 0] - 1.0, poses[:, 1])
        assert (d[b:e] <= 1.0 + 1e-6).all()
        if e < 50:
            assert d[e] > 1.0
        # Robot at the start on a big map: window covers the whole plan.
        cm_big = mpc.Costmap.create(np.zeros((200, 200)),
                                    origin=(-5.0, -5.0), resolution=0.05)
        r2 = _tick(cfg, plan, [0.0, 0.0, 0.0], cm_big, footprint)
        assert int(r2.window_begin) == 0
        assert int(r2.window_end) == 50


class TestLookaheadDistance:
    def test_default_uses_max(self, cfg, empty_costmap, footprint):
        plan = _line_plan(cfg)
        r = _tick(cfg, plan, [0, 0, 0], empty_costmap, footprint, slow_down=False)
        assert float(r.lookahead_dist) == pytest.approx(cfg.lookahead_dist_max)

    def test_slow_down_uses_min(self, cfg, empty_costmap, footprint):
        cfg2 = cfg.replace(lookahead_dist_min=0.2)
        plan = _line_plan(cfg2)
        r = _tick(cfg2, plan, [0, 0, 0], empty_costmap, footprint, slow_down=True)
        assert float(r.lookahead_dist) == pytest.approx(0.2)

    def test_close_to_goal_distance_wins(self, cfg, empty_costmap, footprint):
        cfg2 = cfg.replace(lookahead_dist_close_to_goal=0.15)
        plan = _line_plan(cfg2, length=0.3, n=10)
        r = _tick(cfg2, plan, [0.25, 0.0, 0.0], empty_costmap, footprint,
                  slow_down=True)
        assert bool(r.closer_to_goal)
        assert float(r.lookahead_dist) == pytest.approx(0.15)


class TestHysteresis:
    def test_small_yaw_clears_slow_down(self, cfg, empty_costmap, footprint):
        plan = _line_plan(cfg, yaw=0.2)
        r = _tick(cfg, plan, [0, 0, 0], empty_costmap, footprint, slow_down=True)
        assert not bool(r.slow_down)

    def test_large_yaw_needs_high_cost(self, cfg, empty_costmap, footprint):
        # |carrot yaw| >= 1.0 but footprint cost below the 200/255 gate:
        # slow_down stays false (cpp:228-231).
        plan = _line_plan(cfg, yaw=1.5)
        r = _tick(cfg, plan, [0, 0, 0], empty_costmap, footprint)
        assert not bool(r.slow_down)

    def test_large_yaw_and_cost_sets_slow_down(self, cfg, footprint):
        data = np.full((40, 40), 0.9)  # above 200/255 ≈ 0.784, below lethal
        cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
        plan = _line_plan(cfg, yaw=1.5)
        r = _tick(cfg, plan, [0, 0, 0], cm, footprint)
        assert float(r.footprint_cost) > SLOW_DOWN_COST_GATE
        assert bool(r.slow_down)
        assert not bool(r.lethal)

    def test_lethal_flag(self, cfg, footprint):
        data = np.ones((40, 40))
        cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
        plan = _line_plan(cfg)
        r = _tick(cfg, plan, [0, 0, 0], cm, footprint)
        assert bool(r.lethal)
