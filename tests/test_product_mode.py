"""Product-mode tests: the smooth objective (bilinear costmap, true predicted
footprint, wrapped angles) + the prox-FISTA solver path — the fast non-parity
configuration (BASELINE.json config 3)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc


@pytest.fixture(scope="module")
def product_cfg(cfg):
    compat = dataclasses.replace(
        cfg.compat, buggy_odom_yaw=False, footprint_alias_noop=False,
        lethal_1000x=False, no_angle_wrap=False)
    return cfg.replace(compat=compat, w_footprint=5.0, w_costmap=2.0)


def test_product_objective_is_smooth(product_cfg, footprint):
    """Bilinear sampling gives nonzero costmap gradients (unlike parity)."""
    data = np.zeros((40, 40))
    data[18:25, 22:30] = 0.8
    cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
    scen = mpc.Scenario.create([0, 0, 0], [0.6, 0.0, 0.0], [1, 0, 0],
                               [0.2, 0, 0], footprint, cm)
    obj = mpc.make_objective(product_cfg, parity=False)
    u = jnp.asarray(np.full(9, 0.3), jnp.float32)
    g = jax.grad(lambda uu: obj(uu, scen))(u)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0

    # Parity (nearest-cell) objective: costmap term contributes ~no gradient;
    # product gradient should differ from it.
    gp = jax.grad(lambda uu: mpc.make_objective(product_cfg, parity=True)(uu, scen))(u)
    assert not np.allclose(np.asarray(g), np.asarray(gp))


def test_product_solver_avoids_obstacle(product_cfg, footprint):
    """With smooth costmap gradients the solver steers around a high-cost
    blob instead of driving straight through it."""
    # Smooth Gaussian bump straight ahead (graded cost => lateral gradients;
    # a flat-top blob has zero interior gradient and nothing to steer by).
    yy, xx = np.meshgrid(np.arange(40) * 0.05 - 1.0 + 0.025,
                         np.arange(40) * 0.05 - 1.0 + 0.025, indexing="ij")
    data = 0.95 * np.exp(-(((xx - 0.35) ** 2) + (yy - 0.04) ** 2) / (2 * 0.02))
    cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
    scen = mpc.Scenario.create([0, 0, 0], [0.8, 0.0, 0.0], [1.2, 0, 0],
                               [0.3, 0, 0], footprint, cm)
    obj = mpc.make_objective(product_cfg, parity=False)
    solver = jax.jit(mpc.make_solver(product_cfg, obj, ftol=1e-8, max_iters=400))
    res = solver(jnp.zeros(9), scen)
    u = np.asarray(res.x).reshape(3, 3)
    # Going straight (vy=0) would cross the blob; the optimizer sidesteps.
    assert np.abs(u[:, 1]).max() > 0.02, u

    # And the solution still respects the feasible set.
    for row in u:
        assert np.hypot(row[0], row[1]) <= product_cfg.max_vel_trans + 1e-3


def test_product_engine_runs_closed_loop(product_cfg, empty_costmap, footprint):
    eng = mpc.MpcEngine(product_cfg, parity=False)
    state = eng.init_state()
    plan = mpc.Plan.create(
        np.stack([np.linspace(0, 2, 50), np.zeros(50), np.zeros(50)], 1),
        max_points=product_cfg.max_plan_points)
    pose = jnp.zeros(3, jnp.float32)
    vel = jnp.zeros(3, jnp.float32)
    for _ in range(40):
        out = eng.step(state, plan, pose, vel, empty_costmap, footprint, 0.033)
        state = out.state
        pose = mpc.rollout(out.cmd_vel[None, :], jnp.float32(0.033), pose)[0]
        vel = out.cmd_vel
    assert float(pose[0]) > 0.3  # made real forward progress
    assert np.all(np.isfinite(np.asarray(pose)))


def test_product_closed_loop_quality_vs_parity(cfg):
    """Round-3 verdict item 6: product mode (prox-FISTA + smooth bilinear
    objective) must be SUBSTANTIATED, not just correctness-tested — drive the
    same goal-reachable suite closed-loop through both solvers and require
    product mode to reach goals with parity-class accuracy."""
    from neo_mpc_planner2_tpu.ops.objective import make_objective
    from neo_mpc_planner2_tpu.scenarios import make_scenario_batch
    from neo_mpc_planner2_tpu.simulation import batch_simulate
    from neo_mpc_planner2_tpu.solver import make_solver

    # Same weights as the parity quality pass so only the solver + the
    # smooth objective differ. NOTE (documented in MIGRATION.md): product
    # mode is weight-sensitive — unlike parity's nearest-cell sampling
    # (zero costmap gradient almost everywhere), the bilinear term actively
    # trades tracking for clearance, and cranked obstacle weights
    # (w_costmap 0.5 / w_footprint 2.0 was measured here) can move the
    # closed-loop equilibrium off the goal entirely. Re-tune when migrating.
    pcfg = cfg.replace(
        compat=dataclasses.replace(
            cfg.compat, buggy_odom_yaw=False, footprint_alias_noop=False,
            lethal_1000x=False, unsquared_control_cost=False,
            no_angle_wrap=False))
    sb = make_scenario_batch(pcfg, 6, seed=5, map_size=64, plan_points=48,
                             plan_length_range=(0.7, 1.0),
                             clear_corridor_m=0.55, center_on="plan")
    ticks = 90

    run_par = batch_simulate(cfg, sb, ticks)  # parity SQP, same scenarios
    psolver = jax.vmap(make_solver(pcfg, make_objective(pcfg, parity=False)))
    run_pro = batch_simulate(pcfg, sb, ticks, parity=False,
                             solver_batch=psolver)

    d_par = np.asarray(run_par.goal_dist[:, -1])
    d_pro = np.asarray(run_pro.goal_dist[:, -1])
    # Both reach most goals on this clear-corridor suite; product mode must
    # not be a regression class (same 10 cm capture radius).
    assert (d_par < 0.10).mean() >= 0.8, d_par
    assert (d_pro < 0.10).mean() >= 0.8, d_pro
    # And its solves converge (the flag the warm-start logic branches on).
    assert float(np.asarray(run_pro.converged, np.float32).mean()) > 0.9


def test_product_sqp_closed_loop_quality(cfg):
    """Round-4 verdict item 1: the RECOMMENDED product deployment
    (ARCHITECTURE.md 'Product mode') is the parity SQP fed the SMOOTH
    objective — parity=False with the default solver, no prox-FISTA
    override. That combination must carry a closed-loop quality gate of its
    own, not just the engine smoke test above: drive the same goal-reachable
    suite as the prox-FISTA gate and require parity-class goal capture."""
    import dataclasses

    from neo_mpc_planner2_tpu.scenarios import make_scenario_batch
    from neo_mpc_planner2_tpu.simulation import batch_simulate

    pcfg = cfg.replace(
        compat=dataclasses.replace(
            cfg.compat, buggy_odom_yaw=False, footprint_alias_noop=False,
            lethal_1000x=False, unsquared_control_cost=False,
            no_angle_wrap=False))
    sb = make_scenario_batch(pcfg, 6, seed=5, map_size=64, plan_points=48,
                             plan_length_range=(0.7, 1.0),
                             clear_corridor_m=0.55, center_on="plan")
    ticks = 90

    # solver_batch omitted -> make_sqp_solver_batched(pcfg,
    # make_objective(pcfg, parity=False)): the recommended combination.
    run = batch_simulate(pcfg, sb, ticks, parity=False)
    d = np.asarray(run.goal_dist[:, -1])
    assert (d < 0.10).mean() >= 0.8, d
    # The SQP treats the smooth objective like SLSQP does the parity one;
    # its convergence flag must hold up (warm-start logic branches on it).
    assert float(np.asarray(run.converged, np.float32).mean()) > 0.9
    # Feasibility: every commanded translation respects the cone bound.
    cmds = np.asarray(run.cmds)
    assert np.all(np.hypot(cmds[..., 0], cmds[..., 1])
                  <= pcfg.max_vel_trans + 1e-3)


def test_product_config_wave_matches_sequential(cfg):
    """product_config() flips the line search to a fused candidate wave
    (parallel_line_search). The wave selects the FIRST accepted candidate in
    schedule order — the same alpha sequential backtracking picks — so
    solutions must match the sequential program to float-fusion noise."""
    import dataclasses

    import neo_mpc_planner2_tpu as mpc
    from neo_mpc_planner2_tpu.ops.objective import make_objective
    from neo_mpc_planner2_tpu.scenarios import make_scenario_batch

    base = cfg.replace(
        solver_max_iters=8, solver_max_backtracks=7,
        solver_ls_coarse_after=2, solver_ls_coarse_factor=0.0625,
        compat=dataclasses.replace(
            cfg.compat, buggy_odom_yaw=False, footprint_alias_noop=False,
            lethal_1000x=False, unsquared_control_cost=False,
            no_angle_wrap=False))
    wave = base.replace(parallel_line_search=True)
    sb = make_scenario_batch(base, 8, seed=9, map_size=48, plan_points=32,
                             plan_length_range=(0.7, 1.0),
                             clear_corridor_m=0.55, center_on="plan")

    def solve_all(c):
        obj = make_objective(c, parity=False)
        solver = jax.vmap(mpc.make_sqp_solver(c, obj))
        scens = jax.vmap(lambda p, ca, g, v, fp, cm: mpc.Scenario.create(
            p, ca, g, v, fp, cm, switch_opt=False,
            control_interval=1 / 30))(
            sb.robot_pose,
            jnp.tile(jnp.asarray([0.4, 0.05, 0.1], jnp.float32), (8, 1)),
            sb.plan.poses[jnp.arange(8), sb.plan.n_valid - 1],
            sb.current_vel, sb.footprint, sb.costmap)
        return solver(jnp.zeros((8, 9), jnp.float32), scens)

    rs = solve_all(base)
    rw = solve_all(wave)
    np.testing.assert_allclose(np.asarray(rw.x), np.asarray(rs.x),
                               atol=2e-5, rtol=0)
    assert np.array_equal(np.asarray(rw.iters), np.asarray(rs.iters))


def test_product_config_preset_closed_loop(cfg):
    """The exported product_config() preset drives the closed loop to goals
    (quality twin of the quirks-off pcfg gates above, at the shipped product
    operating point — wave line search, fleet solver knobs)."""
    from neo_mpc_planner2_tpu.scenarios import make_scenario_batch
    from neo_mpc_planner2_tpu.simulation import batch_simulate

    import neo_mpc_planner2_tpu as mpc

    from neo_mpc_planner2_tpu.ops.costmap import (
        required_product_patch_halfwidth)

    pcfg = mpc.product_config().replace(
        prediction_horizon=cfg.prediction_horizon,
        control_steps=cfg.control_steps, opt_tolerance=cfg.opt_tolerance,
        footprint_edge_samples=cfg.footprint_edge_samples,
        acc_x_limit=cfg.acc_x_limit, acc_y_limit=cfg.acc_y_limit,
        acc_theta_limit=cfg.acc_theta_limit,
        min_vel_x=cfg.min_vel_x, min_vel_y=cfg.min_vel_y,
        min_vel_theta=cfg.min_vel_theta, max_vel_x=cfg.max_vel_x,
        max_vel_y=cfg.max_vel_y, max_vel_trans=cfg.max_vel_trans,
        max_vel_theta=cfg.max_vel_theta,
        w_trans=cfg.w_trans, w_orient=cfg.w_orient,
        w_control=cfg.w_control, w_terminal=cfg.w_terminal,
        w_costmap=cfg.w_costmap, w_footprint=cfg.w_footprint,
        lookahead_dist_min=cfg.lookahead_dist_min,
        lookahead_dist_max=cfg.lookahead_dist_max,
        lookahead_dist_close_to_goal=cfg.lookahead_dist_close_to_goal)
    # The shipped second lever: per-solve hoisted patch sampling (0.46 m =
    # the MPO-700 suite footprint circumradius).
    pcfg = pcfg.replace(solver_costmap_patch=(
        required_product_patch_halfwidth(pcfg, 0.05, 0.46)))
    sb = make_scenario_batch(pcfg, 6, seed=5, map_size=64, plan_points=48,
                             plan_length_range=(0.7, 1.0),
                             clear_corridor_m=0.55, center_on="plan")
    run = batch_simulate(pcfg, sb, 90, parity=False)
    d = np.asarray(run.goal_dist[:, -1])
    assert (d < 0.10).mean() >= 0.8, d
    cmds = np.asarray(run.cmds)
    assert np.all(np.hypot(cmds[..., 0], cmds[..., 1])
                  <= pcfg.max_vel_trans + 1e-3)


def test_patch_exact_picks_knob(cfg):
    """product_config ships fast (backend-precision) patch picks; the knob
    plumbs through to the sampler, and on CPU — where every matmul precision
    is f32 — exact and fast solves are bit-identical (the settings may only
    differ on TPU, where fast picks are bf16-rounded; PERF.md round 11f)."""
    import dataclasses

    import neo_mpc_planner2_tpu as mpc
    from neo_mpc_planner2_tpu.ops.costmap import (
        ProductPatchSampler, required_product_patch_halfwidth)
    from neo_mpc_planner2_tpu.scenarios import make_scenario_batch
    from neo_mpc_planner2_tpu.simulation import batch_simulate

    assert mpc.product_config().solver_patch_exact_picks is False
    assert mpc.default_config().solver_patch_exact_picks is True
    assert ProductPatchSampler.__init__.__defaults__[-1] is True

    base = cfg.replace(
        solver_max_iters=8, solver_max_backtracks=7,
        parallel_line_search=True,
        compat=dataclasses.replace(
            cfg.compat, buggy_odom_yaw=False, footprint_alias_noop=False,
            lethal_1000x=False, unsquared_control_cost=False,
            no_angle_wrap=False))
    base = base.replace(solver_costmap_patch=(
        required_product_patch_halfwidth(base, 0.05, 0.46)))
    sb = make_scenario_batch(base, 4, seed=11, map_size=64, plan_points=32,
                             plan_length_range=(0.7, 1.0),
                             clear_corridor_m=0.55, center_on="plan")
    r_exact = batch_simulate(base.replace(solver_patch_exact_picks=True),
                             sb, 6, parity=False)
    r_fast = batch_simulate(base.replace(solver_patch_exact_picks=False),
                            sb, 6, parity=False)
    np.testing.assert_array_equal(np.asarray(r_exact.cmds),
                                  np.asarray(r_fast.cmds))


class TestProductPatchSampler:
    """The per-solve hoisted patch sampler for the smooth objective
    (round 5): values must be BIT-IDENTICAL to the full-map samplers inside
    the coverage guarantee, and the patched objective must equal the
    unpatched one."""

    def _cm(self, seed=3, shape=(64, 64)):
        rng = np.random.default_rng(seed)
        data = rng.uniform(0, 1, shape).astype(np.float32)
        return mpc.Costmap.create(data, origin=(-1.6, -1.6), resolution=0.05)

    def test_extract_patch_onehot_matches_extract_patch(self):
        from neo_mpc_planner2_tpu.ops.costmap import (extract_patch,
                                                      extract_patch_onehot)
        cm = self._cm()
        for (cx, cy) in [(0.0, 0.0), (-1.55, -1.55), (1.2, -0.3)]:
            a = extract_patch(cm, jnp.float32(cx), jnp.float32(cy), 9)
            b = extract_patch_onehot(cm, jnp.float32(cx), jnp.float32(cy), 9)
            # Interior centers: identical windows and corners.
            if -1.0 < cx < 1.0 and -1.0 < cy < 1.0:
                np.testing.assert_array_equal(np.asarray(a.data),
                                              np.asarray(b.data))
                np.testing.assert_array_equal(np.asarray(a.cell0),
                                              np.asarray(b.cell0))

    def test_bilinear_matches_full_map(self):
        from neo_mpc_planner2_tpu.ops.costmap import (
            ProductPatchSampler, cost_at_world_bilinear)
        cm = self._cm()
        rng = np.random.default_rng(4)
        # Points within 0.4 m of the center (halfwidth 12 cells = 0.6 m
        # covers them plus the +1 neighbor).
        wx = jnp.asarray(rng.uniform(-0.4, 0.4, 64), jnp.float32)
        wy = jnp.asarray(rng.uniform(-0.4, 0.4, 64), jnp.float32)
        s = ProductPatchSampler(cm, jnp.float32(0.0), jnp.float32(0.0), 12)
        np.testing.assert_array_equal(
            np.asarray(s.bilinear(wx, wy)),
            np.asarray(cost_at_world_bilinear(cm, wx, wy)))
        # Map-edge coverage: points straddling the boundary read the lethal
        # OOB policy identically.
        s2 = ProductPatchSampler(cm, jnp.float32(-1.5), jnp.float32(-1.5), 12)
        ex = jnp.asarray(rng.uniform(-1.9, -1.1, 64), jnp.float32)
        ey = jnp.asarray(rng.uniform(-1.9, -1.1, 64), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(s2.bilinear(ex, ey)),
            np.asarray(cost_at_world_bilinear(cm, ex, ey)))

    def test_nearest_matches_full_map(self):
        from neo_mpc_planner2_tpu.ops.costmap import (ProductPatchSampler,
                                                      cost_at_world)
        cm = self._cm()
        rng = np.random.default_rng(5)
        wx = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 16)), jnp.float32)
        wy = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 16)), jnp.float32)
        s = ProductPatchSampler(cm, jnp.float32(0.0), jnp.float32(0.0), 14)
        np.testing.assert_array_equal(np.asarray(s.nearest(wx, wy)),
                                      np.asarray(cost_at_world(cm, wx, wy)))

    def test_patched_objective_equals_unpatched(self, footprint):
        """End-to-end: the SQP lane closure with solver_costmap_patch > 0
        produces the same product objective values and the same solve."""
        import dataclasses

        from neo_mpc_planner2_tpu.ops.costmap import (
            required_product_patch_halfwidth)

        cfg0 = mpc.default_config().replace(
            prediction_horizon=0.8, control_steps=3, opt_tolerance=1e-3,
            footprint_edge_samples=8,
            max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7,
            min_vel_x=-0.7, min_vel_y=-0.7,
            w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
            w_costmap=0.5, w_footprint=50.0,
            compat=dataclasses.replace(
                mpc.default_config().compat, buggy_odom_yaw=False,
                footprint_alias_noop=False, lethal_1000x=False,
                unsquared_control_cost=False, no_angle_wrap=False))
        h = required_product_patch_halfwidth(cfg0, 0.05, 0.5)
        cfgp = cfg0.replace(solver_costmap_patch=h)
        cm = self._cm(shape=(64, 64))
        scen = mpc.Scenario.create([0.1, -0.05, 0.2], [0.5, 0.1, 0.1],
                                   [1.0, 0.3, 0.2], [0.2, 0, 0],
                                   footprint, cm)
        obj = mpc.make_objective(cfg0, parity=False)
        u = jnp.asarray(np.linspace(-0.3, 0.5, 9), jnp.float32)

        from neo_mpc_planner2_tpu.sqp import _lane_fobj
        f_plain = _lane_fobj(cfg0, obj, scen)
        f_patch = _lane_fobj(cfgp, obj, scen)
        np.testing.assert_allclose(float(f_patch(u)), float(f_plain(u)),
                                   rtol=1e-6)

        s_plain = jax.jit(mpc.make_sqp_solver(cfg0, obj))(jnp.zeros(9), scen)
        s_patch = jax.jit(mpc.make_sqp_solver(cfgp, obj))(jnp.zeros(9), scen)
        np.testing.assert_allclose(np.asarray(s_patch.x),
                                   np.asarray(s_plain.x), atol=2e-5)

        # prox-FISTA honors the same knob (solver.make_solver wires the
        # identical sampler): solutions match the unpatched prox solve.
        p_plain = jax.jit(mpc.make_solver(cfg0, obj))(jnp.zeros(9), scen)
        p_patch = jax.jit(mpc.make_solver(cfgp, obj))(jnp.zeros(9), scen)
        np.testing.assert_allclose(np.asarray(p_patch.x),
                                   np.asarray(p_plain.x), atol=2e-5)
