"""Lockstep-tail compaction (sqp.make_sqp_solver_batched) bit-identity.

The batched solve front-end re-batches straggler lanes into a compact
sub-batch after `solver_compact_after` iterations (engine.py routes
MpcEngine.batch_step and batch_simulate through it). Per-lane math must match
plain vmap(controller_step) on BOTH runtime branches:

- full fallback (too many alive, e.g. cold start): bit-identical;
- compact (stragglers gathered/finished/scattered): a different compiled
  graph, so XLA fusion may reassociate float ops — values to ~1e-6, with
  exact iteration counts and convergence flags.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.engine import controller_step
from neo_mpc_planner2_tpu.scenarios import make_scenario_batch
from neo_mpc_planner2_tpu.simulation import batch_simulate


def _cfg(**kw):
    base = dict(solver_max_iters=8, footprint_edge_samples=8,
                max_plan_points=32, solver_compact_min_batch=8)
    base.update(kw)
    return mpc.default_config().replace(**base)


def _vmap_ref(cfg):
    return jax.jit(jax.vmap(
        lambda s, p, rp, cv, cm, fp, dt: controller_step(
            cfg, s, p, rp, cv, cm, fp, dt)))


def _assert_same(ref, new):
    for name in ("cmd_vel", "raw_solution", "solver_iters",
                 "solver_converged", "collision", "local_plan"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(new, name))
        assert np.array_equal(a, b), name
    # `fun` is re-derived from the accepted line-search candidate (sqp.py
    # grad-only post-step); its float fusion differs between the two compiled
    # graphs by ~1 ulp while the solutions themselves stay bit-identical.
    np.testing.assert_allclose(np.asarray(ref.fun), np.asarray(new.fun),
                               rtol=1e-6, atol=1e-7)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        ref.state, new.state)


@pytest.mark.parametrize("frac", [0.5, 0.02])
def test_batch_step_matches_vmap_bitwise(frac):
    """frac=0.5 exercises the compact branch on warm ticks; frac=0.02 forces
    the full-batch fallback (more alive lanes than the compact budget)."""
    cfg = _cfg(solver_compact_after=2, solver_compact_frac=frac)
    B = 32
    sb = make_scenario_batch(cfg, B, seed=7, map_size=32, plan_points=24)
    eng = mpc.MpcEngine(cfg)
    ref_step = _vmap_ref(cfg)

    st_ref = st_new = eng.init_batch_state(B)
    for _ in range(3):  # cold tick then warm ticks
        ref = ref_step(st_ref, sb.plan, sb.robot_pose, sb.current_vel,
                       sb.costmap, sb.footprint, sb.delta_t)
        new = eng.batch_step(st_new, sb.plan, sb.robot_pose, sb.current_vel,
                             sb.costmap, sb.footprint, sb.delta_t)
        _assert_same(ref, new)
        st_ref, st_new = ref.state, new.state


def test_compact_branch_taken_on_warm_batch():
    """Warm-majority batch (most lanes start AT their optimum, two perturbed
    stragglers): the stragglers fit the compact budget, the compact branch
    runs them to convergence, and every lane matches vmap(sqp_solve) exactly."""
    from neo_mpc_planner2_tpu.ops.objective import make_objective
    from neo_mpc_planner2_tpu.sqp import (make_sqp_solver,
                                          make_sqp_solver_batched)

    cfg = _cfg(solver_compact_after=8, solver_compact_frac=0.5,
               solver_max_iters=20)
    B = 16
    rng = np.random.default_rng(0)
    cm = mpc.Costmap.create(np.zeros((40, 40)), origin=(-1.0, -1.0),
                            resolution=0.05)
    fp = mpc.Footprint.rectangle(0.6, 0.4)
    carrots = rng.uniform(-0.6, 0.6, (B, 3)).astype(np.float32)
    goals = rng.uniform(-1.0, 1.0, (B, 3)).astype(np.float32)
    vels = rng.uniform(-0.3, 0.3, (B, 3)).astype(np.float32)
    scens = jax.vmap(lambda c, g, v: mpc.Scenario.create(
        jnp.zeros(3), c, g, v, fp, cm))(jnp.asarray(carrots),
                                        jnp.asarray(goals), jnp.asarray(vels))

    obj = make_objective(cfg, parity=True)
    solve_lane = make_sqp_solver(cfg, obj)
    solve_batch = jax.jit(make_sqp_solver_batched(cfg, obj))
    vmap_solve = jax.jit(jax.vmap(solve_lane))

    x0 = jnp.zeros((B, 3 * cfg.control_steps), jnp.float32)
    opt = vmap_solve(x0, scens)
    # Warm starts at the optimum except two perturbed stragglers.
    warm = np.array(opt.x)
    warm[3] += 0.3
    warm[11] -= 0.3
    warm = jnp.asarray(warm)

    ref = vmap_solve(warm, scens)
    new = solve_batch(warm, scens)
    # The compact branch compiles a different (gather/continue/scatter) graph
    # than the monolithic while, so XLA's fusion choices can reassociate float
    # ops: values agree to ~1e-6, not necessarily bitwise (same policy as the
    # tree-sum/rsqrt Cholesky changes, PERF.md).
    np.testing.assert_array_equal(np.asarray(ref.converged),
                                  np.asarray(new.converged))
    np.testing.assert_array_equal(np.asarray(ref.iters), np.asarray(new.iters))
    np.testing.assert_allclose(np.asarray(ref.x), np.asarray(new.x),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ref.fun), np.asarray(new.fun),
                               rtol=2e-5, atol=2e-6)
    iters = np.asarray(new.iters)
    # The compact branch must have been selected (stragglers fit the budget)
    # AND have had real work to do (some lane ran past the switch point).
    n_alive = (iters > cfg.solver_compact_after).sum()
    assert 0 < n_alive <= int(np.ceil(B * cfg.solver_compact_frac))


@pytest.mark.parametrize("max_iters", [8, 20])
def test_adaptive_compaction_matches_vmap(max_iters):
    """Adaptive compaction (solver_compact_adaptive): full-batch iterations
    run only while more than compact_n lanes are alive, then the stragglers
    finish compactly. Must equal plain vmap(sqp_solve) per lane — exact
    iteration counts/flags, values to float-fusion noise — at BOTH operating
    points (the cap-8 bench point, where fixed-k1 compaction auto-disables,
    and the default-fidelity cap)."""
    from neo_mpc_planner2_tpu.ops.objective import make_objective
    from neo_mpc_planner2_tpu.sqp import (make_sqp_solver,
                                          make_sqp_solver_batched)

    cfg = _cfg(solver_max_iters=max_iters, solver_compact_frac=0.25,
               solver_compact_adaptive=True)
    B = 16
    rng = np.random.default_rng(1)
    cm_data = np.zeros((40, 40))
    cm_data[10:14, 22:30] = 0.9
    cm = mpc.Costmap.create(cm_data, origin=(-1.0, -1.0), resolution=0.05)
    fp = mpc.Footprint.rectangle(0.6, 0.4)
    carrots = rng.uniform(-0.6, 0.6, (B, 3)).astype(np.float32)
    goals = rng.uniform(-1.0, 1.0, (B, 3)).astype(np.float32)
    vels = rng.uniform(-0.3, 0.3, (B, 3)).astype(np.float32)
    scens = jax.vmap(lambda c, g, v: mpc.Scenario.create(
        jnp.zeros(3), c, g, v, fp, cm))(jnp.asarray(carrots),
                                        jnp.asarray(goals), jnp.asarray(vels))

    obj = make_objective(cfg, parity=True)
    vmap_solve = jax.jit(jax.vmap(make_sqp_solver(cfg, obj)))
    solve_batch = jax.jit(make_sqp_solver_batched(cfg, obj))

    for x0 in (jnp.zeros((B, 3 * cfg.control_steps), jnp.float32),
               jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3 * cfg.control_steps)),
                           jnp.float32)):
        ref = vmap_solve(x0, scens)
        new = solve_batch(x0, scens)
        np.testing.assert_array_equal(np.asarray(ref.converged),
                                      np.asarray(new.converged))
        np.testing.assert_array_equal(np.asarray(ref.iters),
                                      np.asarray(new.iters))
        np.testing.assert_allclose(np.asarray(ref.x), np.asarray(new.x),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(ref.fun), np.asarray(new.fun),
                                   rtol=2e-5, atol=2e-6)


def test_adaptive_closed_loop_matches_plain():
    """Closed-loop sim with adaptive compaction matches the plain batched
    path to float-fusion noise over several ticks (commands and final
    state), and tick counts stay exact."""
    cfg_plain = _cfg(solver_compact_after=0, solver_compact_frac=0.25)
    cfg_adapt = cfg_plain.replace(solver_compact_adaptive=True)
    sb = make_scenario_batch(cfg_plain, 16, seed=9, map_size=32,
                             plan_points=24)
    run_p = jax.jit(lambda b: batch_simulate(cfg_plain, b, 6))(sb)
    run_a = jax.jit(lambda b: batch_simulate(cfg_adapt, b, 6))(sb)
    np.testing.assert_array_equal(np.asarray(run_p.solver_iters),
                                  np.asarray(run_a.solver_iters))
    np.testing.assert_allclose(np.asarray(run_p.cmds),
                               np.asarray(run_a.cmds), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(run_p.poses),
                               np.asarray(run_a.poses), rtol=2e-5, atol=1e-5)


def test_batch_simulate_init_carry_extends_run():
    """Segmented sim (init carry) reproduces one longer run bitwise — the
    bench's quality pass extends the headline run without recompiling."""
    cfg = _cfg(solver_compact_after=2, solver_compact_frac=0.5)
    sb = make_scenario_batch(cfg, 8, seed=5, map_size=32, plan_points=24)
    run10 = jax.jit(lambda b: batch_simulate(cfg, b, 10))(sb)
    seg1 = jax.jit(lambda b: batch_simulate(cfg, b, 5))(sb)
    # jit like the bench does: eager scan surroundings reassociate float ops
    # enough to flip line-search accept comparisons.
    seg2 = jax.jit(lambda b, s, p, v: batch_simulate(cfg, b, 5,
                                                     init=(s, p, v)))(
        sb, seg1.final_state, seg1.poses[:, -1], seg1.cmds[:, -1])
    np.testing.assert_array_equal(np.asarray(run10.poses[:, 5:]),
                                  np.asarray(seg2.poses))
    np.testing.assert_array_equal(np.asarray(run10.cmds[:, 5:]),
                                  np.asarray(seg2.cmds))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        run10.final_state, seg2.final_state)
