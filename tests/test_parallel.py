"""Distributed tests without a cluster (SURVEY.md §4): 8 virtual CPU devices
via xla_force_host_platform_device_count (set in conftest). Verifies the
('host','chip') mesh, scenario-batch sharding, the fleet-metrics collectives,
and agreement between sharded and single-device execution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.parallel.sharding import (
    FleetMetrics, ShardedEngine, make_mesh, shard_batch)
from neo_mpc_planner2_tpu.scenarios import make_scenario_batch


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should force 8 cpu devices"
    return make_mesh(jax.devices(), hosts=2)


@pytest.fixture(scope="module")
def small_cfg(request):
    cfg = request.getfixturevalue("cfg") if False else None
    return mpc.default_config().replace(
        prediction_horizon=0.8, opt_tolerance=1e-3, footprint_edge_samples=8,
        max_plan_points=32, solver_max_iters=25,
        min_vel_x=-0.7, min_vel_y=-0.7, min_vel_theta=-0.7,
        max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7, max_vel_theta=0.7,
        w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
        w_costmap=0.05, w_footprint=0.0,
        lookahead_dist_min=0.4, lookahead_dist_max=0.4,
        lookahead_dist_close_to_goal=0.4,
    )


def _batch(cfg, n, seed=0):
    return make_scenario_batch(cfg, n, seed=seed, map_size=48, plan_points=24)


class TestMesh:
    def test_mesh_shape(self, mesh):
        assert mesh.axis_names == ("host", "chip")
        assert mesh.devices.shape == (2, 4)

    def test_shard_batch_places_leading_axis(self, mesh):
        x = jnp.zeros((16, 5))
        xs = shard_batch(x, mesh)
        # Each of the 8 devices holds 2 rows.
        shard_shapes = {s.data.shape for s in xs.addressable_shards}
        assert shard_shapes == {(2, 5)}


class TestShardedEngine:
    def test_step_runs_sharded(self, small_cfg, mesh):
        eng = ShardedEngine(small_cfg, mesh)
        sb = _batch(small_cfg, 16)
        state = eng.shard(sb.state)
        plan = eng.shard(sb.plan)
        rest = tuple(eng.shard(x) for x in (sb.robot_pose, sb.current_vel,
                                            sb.costmap, sb.footprint, sb.delta_t))
        out, metrics = eng.step(state, plan, *rest)
        assert out.cmd_vel.shape == (16, 3)
        assert np.all(np.isfinite(np.asarray(out.cmd_vel)))
        assert isinstance(metrics, FleetMetrics)
        assert 0.0 <= float(metrics.converged_frac) <= 1.0
        assert np.isfinite(float(metrics.mean_cost))

    def test_matches_single_device(self, small_cfg, mesh):
        """Sharded execution must be bitwise-equivalent in semantics to the
        plain vmap on one device (same program, different partitioning)."""
        eng = ShardedEngine(small_cfg, mesh, donate_state=False)
        sb = _batch(small_cfg, 8, seed=3)
        state = eng.shard(sb.state)
        plan = eng.shard(sb.plan)
        rest = tuple(eng.shard(x) for x in (sb.robot_pose, sb.current_vel,
                                            sb.costmap, sb.footprint, sb.delta_t))
        out_sharded, _ = eng.step(state, plan, *rest)

        eng1 = mpc.MpcEngine(small_cfg)
        out_local = eng1.batch_step(sb.state, sb.plan, sb.robot_pose,
                                    sb.current_vel, sb.costmap, sb.footprint,
                                    sb.delta_t)
        np.testing.assert_allclose(np.asarray(out_sharded.cmd_vel),
                                   np.asarray(out_local.cmd_vel),
                                   atol=1e-5)

    def test_multi_step_state_threading(self, small_cfg, mesh):
        eng = ShardedEngine(small_cfg, mesh, donate_state=False)
        sb = _batch(small_cfg, 8, seed=5)
        state = eng.shard(sb.state)
        plan = eng.shard(sb.plan)
        rest = tuple(eng.shard(x) for x in (sb.robot_pose, sb.current_vel,
                                            sb.costmap, sb.footprint, sb.delta_t))
        cmds = []
        for _ in range(3):
            out, _ = eng.step(state, plan, *rest)
            state = out.state
            cmds.append(np.asarray(out.cmd_vel))
        # State threads through: the accel-clamped commands evolve tick to
        # tick and stay finite.
        assert np.all(np.isfinite(cmds[-1]))
        assert not np.allclose(cmds[0], cmds[1])
        # The warm start persisted (same goal): guesses are non-zero now.
        assert float(jnp.sum(jnp.abs(state.initial_guess))) > 0.0


def test_dryrun_multichip_entrypoint():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

    fn, args = mod.entry()
    cmd, new_state = jax.jit(fn)(*args)
    assert cmd.shape == (3,)
    assert np.all(np.isfinite(np.asarray(cmd)))


class TestShardedRollingWindow:
    def test_matches_local_rolling_view(self, small_cfg, mesh):
        """ShardedEngine(window_cells=...): each lane's zero-copy rolling
        view re-centers shard-locally; results match the unsharded batched
        step on explicitly-built views."""
        from neo_mpc_planner2_tpu.simulation import rolling_view

        eng = ShardedEngine(small_cfg, mesh, donate_state=False,
                            window_cells=24)
        sb = _batch(small_cfg, 8, seed=7)
        world = jax.vmap(lambda c: c.with_flat())(sb.costmap)
        state = eng.shard(sb.state)
        plan = eng.shard(sb.plan)
        rest = tuple(eng.shard(x) for x in (sb.robot_pose, sb.current_vel,
                                            world, sb.footprint, sb.delta_t))
        out_sharded, metrics = eng.step(state, plan, *rest)

        views = jax.vmap(rolling_view, in_axes=(0, 0, None))(
            world, sb.robot_pose, 24)
        eng1 = mpc.MpcEngine(small_cfg)
        out_local = eng1.batch_step(sb.state, sb.plan, sb.robot_pose,
                                    sb.current_vel, views, sb.footprint,
                                    sb.delta_t)
        np.testing.assert_allclose(np.asarray(out_sharded.cmd_vel),
                                   np.asarray(out_local.cmd_vel), atol=1e-5)
        assert np.isfinite(float(metrics.mean_cost))


class TestShardedLiveUpdates:
    def test_updates_between_sharded_steps(self, small_cfg, mesh):
        """Composition of the round-4 pieces: a SHARDED rolling-window fleet
        whose per-lane world maps receive dirty-window updates BETWEEN steps
        (vmapped Costmap.update_window on the sharded costmap pytree) — the
        full live-costmap deployment shape at fleet scale. Per-lane results
        match the unsharded path fed identically-updated maps."""
        from neo_mpc_planner2_tpu.simulation import rolling_view

        eng = ShardedEngine(small_cfg, mesh, donate_state=False,
                            window_cells=24)
        sb = _batch(small_cfg, 8, seed=9)
        world = jax.vmap(lambda c: c.with_flat())(sb.costmap)
        upd = jax.jit(jax.vmap(lambda c, b, l: c.update_window(b, l)))

        rng = np.random.default_rng(3)
        blocks = jnp.asarray(rng.uniform(0, 1, (8, 6, 6)), jnp.float32)
        los = jnp.asarray(rng.integers(0, 40, (8, 2)), jnp.int32)

        # Sharded: update the sharded world maps in place, then step.
        world_sh = eng.shard(world)
        world_sh = upd(world_sh, eng.shard(blocks), eng.shard(los))
        # The update preserves the sharding (no host gather).
        assert len(world_sh.data.sharding.device_set) == 8
        state = eng.shard(sb.state)
        out_sh, _ = eng.step(state, eng.shard(sb.plan),
                             eng.shard(sb.robot_pose),
                             eng.shard(sb.current_vel), world_sh,
                             eng.shard(sb.footprint), eng.shard(sb.delta_t))

        # Unsharded twin on identically-updated maps.
        world_loc = upd(world, blocks, los)
        views = jax.vmap(rolling_view, in_axes=(0, 0, None))(
            world_loc, sb.robot_pose, 24)
        eng1 = mpc.MpcEngine(small_cfg)
        out_loc = eng1.batch_step(sb.state, sb.plan, sb.robot_pose,
                                  sb.current_vel, views, sb.footprint,
                                  sb.delta_t)
        np.testing.assert_allclose(np.asarray(out_sh.cmd_vel),
                                   np.asarray(out_loc.cmd_vel), atol=1e-5)
        # And the update actually changed something observable.
        np.testing.assert_array_equal(
            np.asarray(world_loc.data[0, los[0, 1], los[0, 0]]),
            np.asarray(blocks)[0, 0, 0])
