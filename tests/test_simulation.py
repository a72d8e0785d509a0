"""Closed-loop simulation tests: the device-resident FollowPath loop must
reach goals, respect limits, and stop for obstacles — the Gazebo-style
validation the reference relied on (README.md:14-16), but in-repo and batched."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.simulation import batch_simulate, simulate_follow_path
from neo_mpc_planner2_tpu.scenarios import make_scenario_batch


@pytest.fixture(scope="module")
def sim_cfg():
    return mpc.default_config().replace(
        prediction_horizon=0.8, opt_tolerance=1e-3, footprint_edge_samples=8,
        max_plan_points=64, solver_max_iters=30,
        acc_x_limit=2.5, acc_y_limit=2.5, acc_theta_limit=3.0,
        min_vel_x=-0.7, min_vel_y=-0.7, min_vel_theta=-0.7,
        max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7, max_vel_theta=0.7,
        w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
        w_costmap=0.05, w_footprint=0.0,
        lookahead_dist_min=0.4, lookahead_dist_max=0.4,
        lookahead_dist_close_to_goal=0.4,
    )


def test_reaches_goal_straight_line(sim_cfg):
    plan = mpc.Plan.create(
        np.stack([np.linspace(0, 2, 50), np.zeros(50), np.zeros(50)], 1),
        max_points=sim_cfg.max_plan_points)
    cm = mpc.Costmap.create(np.zeros((120, 120)), origin=(-1.0, -1.0),
                            resolution=0.05)
    fp = mpc.Footprint.rectangle(0.6, 0.4)
    res = jax.jit(lambda: simulate_follow_path(
        sim_cfg, plan, cm, fp, jnp.zeros(3), jnp.zeros(3), 200))()
    gd = np.asarray(res.goal_dist)
    assert gd[-1] < 0.05, gd[-1]
    # Speed cone respected at every tick.
    speeds = np.hypot(np.asarray(res.cmds)[:, 0], np.asarray(res.cmds)[:, 1])
    assert speeds.max() <= sim_cfg.max_vel_trans + 1e-4
    # Acceleration clamp: per-tick command delta bounded.
    d = np.abs(np.diff(np.asarray(res.cmds), axis=0))
    lim = np.array([sim_cfg.acc_x_limit, sim_cfg.acc_y_limit,
                    sim_cfg.acc_theta_limit]) * sim_cfg.control_interval
    assert np.all(d <= lim + 1e-4)


def test_wall_stops_robot(sim_cfg):
    data = np.zeros((120, 120))
    data[:, 30:] = 1.0  # lethal wall at x > 0.5 (origin -1, res 0.05)
    cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
    plan = mpc.Plan.create(
        np.stack([np.linspace(0, 2, 50), np.zeros(50), np.zeros(50)], 1),
        max_points=sim_cfg.max_plan_points)
    fp = mpc.Footprint.rectangle(0.6, 0.4)
    res = jax.jit(lambda: simulate_follow_path(
        sim_cfg, plan, cm, fp, jnp.zeros(3), jnp.zeros(3), 150))()
    # The robot never drives its center into the wall.
    assert np.asarray(res.poses)[:, 0].max() < 0.5
    # And either latched a predicted collision / footprint stop or the lethal
    # gate fired at some point.
    assert bool(np.asarray(res.collisions).any() | np.asarray(res.lethal).any())


def test_batched_simulation(sim_cfg):
    sb = make_scenario_batch(sim_cfg, 4, seed=1, map_size=64, plan_points=32)
    res = jax.jit(lambda: batch_simulate(sim_cfg, sb, 60))()
    assert res.poses.shape == (4, 60, 3)
    assert np.all(np.isfinite(np.asarray(res.poses)))
    # Most scenarios make progress toward their goals.
    gd = np.asarray(res.goal_dist)
    assert (gd[:, -1] < gd[:, 0]).sum() >= 3


def test_corridor_carving_clamps_plan_neighborhood(sim_cfg):
    """clear_corridor_m reproduces the global-planner contract: no cell within
    the corridor radius of the plan polyline exceeds corridor_max_cost, and
    cells far from every plan stay untouched vs the uncarved batch."""
    kw = dict(batch=16, seed=7, map_size=64, n_obstacles=8, plan_points=64,
              lethal_threshold=0.8, plan_length_range=(0.7, 1.1))
    raw = make_scenario_batch(sim_cfg, **kw)
    carved = make_scenario_batch(sim_cfg, clear_corridor_m=0.55,
                                 corridor_max_cost=0.6, **kw)
    res = float(raw.costmap.resolution[0])
    half = 64 * res / 2.0
    centers = np.arange(64) * res - half + res / 2.0
    cxx, cyy = np.meshgrid(centers, centers, indexing="xy")  # [y, x] grid
    pts = np.asarray(raw.plan.px), np.asarray(raw.plan.py)
    for b in range(16):
        n = int(np.asarray(raw.plan.n_valid)[b])
        px, py = pts[0][b][:n], pts[1][b][:n]
        d = np.sqrt((cxx[None] - px[:, None, None]) ** 2
                    + (cyy[None] - py[:, None, None]) ** 2).min(0)
        cm = np.asarray(carved.costmap.data[b])
        rm = np.asarray(raw.costmap.data[b])
        # The generator subsamples every 2nd plan pose; leave the half-gap
        # (~2 cm at these plan lengths) of slack on the inside of the radius.
        assert cm[d < 0.53].max() <= 0.6 + 1e-6
        far = d > 0.55 + res  # strictly outside (cell-center metric slack)
        np.testing.assert_array_equal(cm[far], rm[far])


class TestRollingWindow:
    """nav2 rolling-local-costmap semantics: the controller sees a fixed-size
    window re-centered on the robot each tick, so plans longer than the
    window traverse cleanly — where a static window latches the lethal
    out-of-window band."""

    def _plan_and_world(self, sim_cfg):
        plan = mpc.Plan.create(
            np.stack([np.linspace(0, 2.4, 64), np.zeros(64),
                      np.zeros(64)], 1),
            max_points=sim_cfg.max_plan_points)
        world = mpc.Costmap.create(np.zeros((128, 128)), origin=(-1.2, -3.2),
                                   resolution=0.05)  # spans x,y in ±3.2-ish
        fp = mpc.Footprint.rectangle(0.6, 0.4)
        return plan, world, fp

    def test_static_window_latches_long_plan(self, sim_cfg):
        plan, _, fp = self._plan_and_world(sim_cfg)
        cm = mpc.Costmap.create(np.zeros((64, 64)), origin=(-1.6, -1.6),
                                resolution=0.05)  # 3.2 m static window
        res = jax.jit(lambda: simulate_follow_path(
            sim_cfg, plan, cm, fp, jnp.zeros(3), jnp.zeros(3), 250))()
        # The lethal out-of-window band stops the robot: the predicted-
        # collision latch fires as the rollout crosses the window edge
        # (or the footprint gate, whichever the geometry hits first).
        assert (np.asarray(res.collisions).any()
                or np.asarray(res.lethal).any())
        assert np.asarray(res.goal_dist)[-1] > 0.3

    def test_rolling_window_traverses_long_plan(self, sim_cfg):
        plan, world, fp = self._plan_and_world(sim_cfg)
        res = jax.jit(lambda: simulate_follow_path(
            sim_cfg, plan, world, fp, jnp.zeros(3), jnp.zeros(3), 250,
            window_cells=64))()
        assert not np.asarray(res.lethal).any()
        assert np.asarray(res.goal_dist)[-1] < 0.05

    def test_rolling_window_extraction_matches_world(self, sim_cfg):
        """Window costs == world costs at every point the window covers, and
        the window clamps inside the world near its edge."""
        from neo_mpc_planner2_tpu.simulation import rolling_window
        from neo_mpc_planner2_tpu.ops.costmap import cost_at_world
        rng = np.random.default_rng(3)
        world = mpc.Costmap.create(rng.random((96, 80)), origin=(-2.0, -1.0),
                                   resolution=0.05)
        for pose_xy in [(0.0, 0.5), (-1.9, -0.9), (1.9, 3.7), (5.0, 5.0)]:
            pose = jnp.asarray([*pose_xy, 0.0], jnp.float32)
            win = rolling_window(world, pose, 32)
            assert win.data.shape == (32, 32)
            ox, oy = float(win.origin[0]), float(win.origin[1])
            # clamped inside world bounds
            assert ox >= float(world.origin[0]) - 1e-6
            assert oy >= float(world.origin[1]) - 1e-6
            wx = jnp.asarray(rng.uniform(ox, ox + 32 * 0.05, 64), jnp.float32)
            wy = jnp.asarray(rng.uniform(oy, oy + 32 * 0.05, 64), jnp.float32)
            np.testing.assert_array_equal(
                np.asarray(cost_at_world(win, wx, wy)),
                np.asarray(cost_at_world(world, wx, wy)))

    def test_view_sampling_matches_slice(self, sim_cfg):
        """The zero-copy rolling VIEW (bounds metadata on the world map) must
        sample identically to the materialized slice at every point — inside
        the window (same cells), outside it (lethal out-of-window band), and
        beyond the world — across every sampler the engine uses."""
        from neo_mpc_planner2_tpu.ops.costmap import (
            cost_at_world, cost_at_world_bilinear, cost_at_world_onehot)
        from neo_mpc_planner2_tpu.ops.footprint import line_cost_exact
        from neo_mpc_planner2_tpu.simulation import (rolling_view,
                                                     rolling_window)
        rng = np.random.default_rng(5)
        world = mpc.Costmap.create(rng.random((96, 80)), origin=(-2.0, -1.0),
                                   resolution=0.05).with_flat()
        for pose_xy in [(0.0, 0.5), (-1.9, -0.9), (1.9, 3.7), (5.0, 5.0)]:
            pose = jnp.asarray([*pose_xy, 0.0], jnp.float32)
            win = rolling_window(world, pose, 32)
            view = rolling_view(world, pose, 32)
            assert float(view.extent_world()) == pytest.approx(
                float(win.extent_world()))
            # Points spanning in-window, out-of-window, and out-of-world.
            wx = jnp.asarray(rng.uniform(-3.0, 5.0, 256), jnp.float32)
            wy = jnp.asarray(rng.uniform(-2.0, 6.0, 256), jnp.float32)
            for fn in (cost_at_world, cost_at_world_onehot,
                       cost_at_world_bilinear):
                np.testing.assert_array_equal(
                    np.asarray(fn(view, wx, wy)), np.asarray(fn(win, wx, wy)),
                    err_msg=fn.__name__)
            np.testing.assert_array_equal(
                np.asarray(line_cost_exact(view, wx[:32], wy[:32],
                                           wx[32:64], wy[32:64])),
                np.asarray(line_cost_exact(win, wx[:32], wy[:32],
                                           wx[32:64], wy[32:64])))

    def test_view_closed_loop_matches_slice(self, sim_cfg):
        """Full closed-loop rolling sim: view == slice (same sampled values;
        different gather graphs may reassociate float fusions ~1e-6)."""
        from neo_mpc_planner2_tpu.scenarios import make_scenario_batch
        sb = make_scenario_batch(sim_cfg, 4, seed=9, map_size=96,
                                 plan_points=64, plan_length_range=(1.5, 2.2))
        view = jax.jit(lambda b: batch_simulate(
            sim_cfg, b, 40, window_cells=64, window_view=True))(sb)
        slc = jax.jit(lambda b: batch_simulate(
            sim_cfg, b, 40, window_cells=64, window_view=False))(sb)
        np.testing.assert_allclose(np.asarray(view.cmds),
                                   np.asarray(slc.cmds), atol=2e-6)
        np.testing.assert_allclose(np.asarray(view.poses),
                                   np.asarray(slc.poses), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(view.lethal),
                                      np.asarray(slc.lethal))

    def test_batched_rolling_matches_single(self, sim_cfg):
        """batch_simulate(window_cells=...) lane == simulate_follow_path on
        the same scenario."""
        from neo_mpc_planner2_tpu.scenarios import (ScenarioBatch,
                                                    make_scenario_batch)
        sb = make_scenario_batch(sim_cfg, 4, seed=9, map_size=96,
                                 plan_points=64,
                                 plan_length_range=(1.5, 2.2))
        run = jax.jit(lambda b: batch_simulate(sim_cfg, b, 40,
                                               window_cells=64))(sb)
        lane = jax.tree.map(lambda x: x[2], sb)
        single = jax.jit(lambda: simulate_follow_path(
            sim_cfg, lane.plan, lane.costmap, lane.footprint,
            lane.robot_pose, lane.current_vel, 40, window_cells=64))()
        np.testing.assert_allclose(np.asarray(run.cmds[2]),
                                   np.asarray(single.cmds), atol=2e-6)


def test_maps_on_device_matches_host(sim_cfg):
    """Device-synthesized costmaps are numerically equivalent to the host
    path (same blob parameters; float32 vs float64 evaluation) with
    identical plans/poses/origins."""
    kw = dict(batch=8, seed=11, map_size=64, n_obstacles=6, plan_points=64,
              lethal_threshold=0.8, plan_length_range=(0.7, 1.1),
              clear_corridor_m=0.55, center_on="plan")
    host = make_scenario_batch(sim_cfg, **kw)
    dev = make_scenario_batch(sim_cfg, maps_on_device=True, **kw)
    np.testing.assert_allclose(np.asarray(dev.costmap.data),
                               np.asarray(host.costmap.data),
                               atol=1e-5, rtol=0)
    np.testing.assert_array_equal(np.asarray(dev.costmap.origin),
                                  np.asarray(host.costmap.origin))
    np.testing.assert_array_equal(np.asarray(dev.plan.px),
                                  np.asarray(host.plan.px))
    np.testing.assert_array_equal(np.asarray(dev.robot_pose),
                                  np.asarray(host.robot_pose))
    # Exact-lethal saturation survives the float32 path (gate cells == 1.0).
    hd, dd = np.asarray(host.costmap.data), np.asarray(dev.costmap.data)
    assert ((hd == 1.0) == (dd == 1.0)).all()


class TestDynamicObstacles:
    """Per-tick costmap dynamics: the reference's server gets a fresh costmap
    with every service call; batch_simulate(dynamic_obstacles=...) is the
    batched equivalent — blob centers advance linearly and the map is
    re-synthesized on device every tick."""

    def _scenario(self, sim_cfg, batch=2):
        plan = np.stack([np.linspace(0, 2.0, 64), np.zeros(64),
                         np.zeros(64)], 1).astype(np.float32)
        plan = mpc.Plan.create(plan, max_points=sim_cfg.max_plan_points)
        plan = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), plan)
        cm = mpc.Costmap.create(np.zeros((96, 96)), origin=(-1.2, -1.2),
                                resolution=0.05)
        fp = mpc.Footprint.rectangle(0.6, 0.4)
        from neo_mpc_planner2_tpu.scenarios import ScenarioBatch
        from neo_mpc_planner2_tpu.engine import init_state
        bcast = lambda t: jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), t)
        return ScenarioBatch(
            state=bcast(init_state(sim_cfg)), plan=plan,
            robot_pose=jnp.zeros((batch, 3)), current_vel=jnp.zeros((batch, 3)),
            costmap=bcast(cm), footprint=bcast(fp),
            delta_t=jnp.full((batch,), 1 / 30, jnp.float32))

    def test_crossing_obstacle_delays_but_goal_reached(self, sim_cfg):
        """Lane 0: an obstacle crossing the path (must be outwaited or
        skirted). Lane 1: the same obstacle far away (free run). The blocked
        lane reaches the goal strictly later; neither lane ever has its
        center inside the moving lethal core."""
        cfg = sim_cfg.replace(w_costmap=0.5)
        sb = self._scenario(cfg)
        # One blob per lane: lane 0 starts ON the path at x=1.0 moving +y at
        # 0.3 m/s (clears the corridor after ~2 s); lane 1's sits at y=+9
        # (outside the map; map stays free).
        centers = jnp.asarray([[[1.0, 0.0]], [[1.0, 9.0]]], jnp.float32)
        amp = jnp.full((2, 1), 0.95, jnp.float32)
        vel = jnp.asarray([[[0.0, 0.3]], [[0.0, 0.3]]], jnp.float32)
        run = jax.jit(lambda b: batch_simulate(
            cfg, b, 280, dynamic_obstacles=(centers, amp, vel),
            obstacle_lethal_threshold=0.5))(sb)
        gd = np.asarray(run.goal_dist)
        assert gd[0, -1] < 0.1 and gd[1, -1] < 0.1, gd[:, -1]
        first0 = int(np.argmax(gd[0] < 0.1))
        first1 = int(np.argmax(gd[1] < 0.1))
        assert first0 > first1 + 10, (first0, first1)
        # The robot center never enters the moving lethal core (blob value
        # > 0.5 within ~0.32 m of the advancing center).
        poses = np.asarray(run.poses[0])
        dt = 1 / 30
        t = (np.arange(280) * dt)[:, None]
        c = np.array([1.0, 0.0])[None, :] + t * np.array([0.0, 0.3])[None, :]
        d = np.linalg.norm(poses[:, :2] - c, axis=-1)
        assert d.min() > 0.32, d.min()

    def test_dynamic_t0_matches_static_map(self, sim_cfg):
        """At zero obstacle velocity the dynamic path must reproduce the
        static-map simulation tick for tick (same blob synthesis, same
        solver program)."""
        from neo_mpc_planner2_tpu.scenarios import blob_maps
        cfg = sim_cfg.replace(w_costmap=0.5)
        sb = self._scenario(cfg)
        centers = jnp.asarray([[[0.8, 0.2]], [[0.6, -0.3]]], jnp.float32)
        amp = jnp.full((2, 1), 0.9, jnp.float32)
        data = blob_maps(centers, amp, 96, sb.costmap.resolution[0],
                         0.5, origin=sb.costmap.origin)
        static_sb = sb._replace(costmap=sb.costmap.replace(data=data))
        run_d = jax.jit(lambda b: batch_simulate(
            cfg, b, 40, dynamic_obstacles=(centers, amp, jnp.zeros((2, 1, 2))),
            obstacle_lethal_threshold=0.5))(sb)
        run_s = jax.jit(lambda b: batch_simulate(cfg, b, 40))(static_sb)
        np.testing.assert_allclose(np.asarray(run_d.cmds),
                                   np.asarray(run_s.cmds), atol=2e-6)


def test_u8_gather_commands_identical_on_raw_grid(sim_cfg):
    """cfg.solver_costmap_u8 routes the solver's merit-eval gather through
    the uint8 raw-scale companion buffer. On maps whose values lie on the
    /255 grid (every nav2-sourced map) the decoded costs are bit-identical,
    so the whole closed loop must produce identical commands."""
    cfg = sim_cfg.replace(w_costmap=0.5)
    sb = make_scenario_batch(cfg, 4, seed=11, map_size=64, plan_points=48)
    # Snap the synthetic float maps onto the nav2 raw /255 grid.
    raw = jnp.round(sb.costmap.data * 255.0).clip(0, 255)
    grid_cm = sb.costmap.replace(data=raw.astype(jnp.float32) / 255.0)
    sb = sb._replace(costmap=grid_cm)
    run_f = jax.jit(lambda b: batch_simulate(cfg, b, 30))(sb)
    run_u = jax.jit(lambda b: batch_simulate(
        cfg.replace(solver_costmap_u8=True), b, 30))(sb)
    np.testing.assert_array_equal(np.asarray(run_f.cmds),
                                  np.asarray(run_u.cmds))
    np.testing.assert_array_equal(np.asarray(run_f.poses),
                                  np.asarray(run_u.poses))


def test_u8_auto_resolves_by_map_size(sim_cfg):
    """solver_costmap_u8="auto" keeps the f32 gather on small maps (where u8
    measured slower) and switches to the u8 source at >= 128² cells; on a
    raw-grid map both programs must agree bit-for-bit with the explicit
    settings they resolve to."""
    from neo_mpc_planner2_tpu.ops.costmap import (U8_AUTO_MIN_CELLS,
                                                  u8_source_enabled)

    assert not u8_source_enabled("auto", 64 * 64)
    assert u8_source_enabled("auto", U8_AUTO_MIN_CELLS)
    assert u8_source_enabled(True, 4)
    assert not u8_source_enabled(False, 10**9)

    cfg = sim_cfg.replace(w_costmap=0.5)
    sb = make_scenario_batch(cfg, 2, seed=13, map_size=64, plan_points=48)
    raw = jnp.round(sb.costmap.data * 255.0).clip(0, 255)
    sb = sb._replace(costmap=sb.costmap.replace(
        data=raw.astype(jnp.float32) / 255.0))
    run_auto = jax.jit(lambda b: batch_simulate(
        cfg.replace(solver_costmap_u8="auto"), b, 10))(sb)
    run_off = jax.jit(lambda b: batch_simulate(cfg, b, 10))(sb)
    # 64² map: auto resolves to the f32 source — identical program.
    np.testing.assert_array_equal(np.asarray(run_auto.cmds),
                                  np.asarray(run_off.cmds))


class TestCostmapUpdateRegime:
    """batch_simulate(costmap_updates=...) — the incremental dirty-window
    dynamic regime (round-3 verdict item 2)."""

    def _sb(self, cfg, batch=3, map_size=48):
        from neo_mpc_planner2_tpu.scenarios import make_scenario_batch
        return make_scenario_batch(cfg, batch, seed=42, map_size=map_size,
                                   plan_points=24,
                                   plan_length_range=(0.7, 1.0))

    def test_zero_amp_updates_match_static(self, cfg):
        """Updates that repaint the static base (amp=0 blob) must leave the
        closed loop numerically identical to the plain static run — the
        update plumbing (carried map, flat refresh) adds no value drift."""
        from neo_mpc_planner2_tpu.simulation import batch_simulate
        sb = self._sb(cfg)
        B = sb.robot_pose.shape[0]
        static = batch_simulate(cfg, sb, 5)
        upd = batch_simulate(
            cfg, sb, 5,
            costmap_updates=(jnp.zeros((B, 2)), jnp.zeros((B,)),
                             jnp.zeros((B, 2))),
            update_cells=12)
        np.testing.assert_allclose(np.asarray(upd.cmds),
                                   np.asarray(static.cmds), atol=1e-6)

    def test_painted_obstacle_latches_collision(self, cfg):
        """A lethal obstacle painted INTO the map via per-tick updates (not
        present in the staged base) must latch the predicted-collision stop —
        the live-costmap semantics the reference's subscription provides."""
        from neo_mpc_planner2_tpu.simulation import batch_simulate
        sb = self._sb(cfg)
        B = sb.robot_pose.shape[0]
        # Obstacle painted ON the robot start (plans start at the origin):
        # the update stream writes lethal cells under the footprint, so a
        # safety gate (plugin lethal throw or collision_footprint zeroing)
        # must fire — proving the per-tick dirty-window writes actually reach
        # the engine's hoisted samplers.
        centers = jnp.tile(jnp.asarray([[0.0, 0.0]], jnp.float32), (B, 1))
        amp = jnp.full((B,), 1.0)
        vel = jnp.zeros((B, 2))
        static = batch_simulate(cfg, sb, 5)
        upd = batch_simulate(cfg, sb, 5,
                             costmap_updates=(centers, amp, vel),
                             update_cells=12,
                             obstacle_lethal_threshold=0.5)
        assert not bool(np.asarray(static.collisions).any())
        assert not bool(np.asarray(static.lethal).any())
        blocked = np.asarray(upd.lethal) | np.asarray(upd.collisions)
        assert bool(blocked.all(axis=0)[1:].all()), blocked
        # Gated ticks command zero.
        cmds = np.asarray(upd.cmds)
        np.testing.assert_array_equal(cmds[blocked],
                                      np.zeros((int(blocked.sum()), 3)))

    def test_chained_segments_resume_updated_map(self, cfg):
        """Chaining two costmap_updates segments through (init=,
        final_costmap, advanced centers) reproduces one longer run exactly.
        Rebuilding from the pristine scenario_batch.costmap instead would
        silently discard the first segment's painted cells (round-4 review
        finding) — final_costmap is the documented resume handle."""
        from neo_mpc_planner2_tpu.simulation import batch_simulate
        sb = self._sb(cfg)
        B = sb.robot_pose.shape[0]
        centers = jnp.tile(jnp.asarray([[0.45, -0.3]], jnp.float32), (B, 1))
        amp = jnp.full((B,), 0.9)
        vel = jnp.tile(jnp.asarray([[0.25, 0.2]], jnp.float32), (B, 1))
        updates = (centers, amp, vel)
        full = batch_simulate(cfg, sb, 6, costmap_updates=updates,
                              update_cells=12)
        assert full.final_costmap is not None

        a = batch_simulate(cfg, sb, 3, costmap_updates=updates,
                           update_cells=12)
        dt = cfg.control_interval
        # The tick clock restarts per call: advance the centers by the first
        # segment's elapsed time, resume the state AND the updated map.
        upd_b = (centers + 3 * dt * vel, amp, vel)
        b = batch_simulate(cfg, sb, 3,
                           costmap_updates=upd_b, update_cells=12,
                           init_costmap=a.final_costmap,
                           init=(a.final_state, a.poses[:, -1],
                                 a.cmds[:, -1]))
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([a.cmds, b.cmds], axis=1)),
            np.asarray(full.cmds), atol=1e-6)
        np.testing.assert_allclose(np.asarray(b.final_costmap.data),
                                   np.asarray(full.final_costmap.data),
                                   atol=1e-6)

    def test_updates_compose_with_rolling_view(self, cfg):
        """Updates + zero-copy rolling window = the full deployment shape:
        world map carried and updated, window following the robot."""
        from neo_mpc_planner2_tpu.simulation import batch_simulate
        from neo_mpc_planner2_tpu.scenarios import make_scenario_batch
        sb = make_scenario_batch(cfg, 2, seed=43, map_size=96,
                                 plan_points=24, plan_length_range=(0.7, 1.0))
        B = 2
        static = batch_simulate(cfg, sb, 4, window_cells=48)
        upd = batch_simulate(
            cfg, sb, 4, window_cells=48,
            costmap_updates=(jnp.zeros((B, 2)), jnp.zeros((B,)),
                             jnp.zeros((B, 2))),
            update_cells=12)
        np.testing.assert_allclose(np.asarray(upd.cmds),
                                   np.asarray(static.cmds), atol=1e-6)
