"""Large-scale oracle-parity study (the BASELINE.md north-star gate).

Runs N scenarios of the canonical MPO-700/MPO-500 suites through BOTH sides:

  device: pursuit -> ONE vmapped solve_step dispatch (ftol 1e-8, 300 iters)
  oracle: scipy SLSQP server (oracle.OracleServer) on a multiprocessing pool

and reports the full command-diff distribution, the matched fraction at the
1e-2 m/s tolerance the committed gate uses, and a per-scenario breakdown of
every unmatched command (which side reached the better objective, scipy's
success flag). It also measures scipy's OWN self-agreement ceiling: each
oracle solve is re-run from +/-1e-6-perturbed warm starts; the fraction of
scenarios where scipy disagrees with itself beyond the same tolerance bounds
what any cross-solver gate can honestly demand.

Usage (CPU; the oracle is scipy either way):
  env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/parity_study.py \
      --n 300 --out PARITY_REPORT.json

Reference anchor: mpc_optimization_server.py:363-364 (the scipy call this
study replicates bit-faithfully on the oracle side).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CMD_TOL = 1e-2          # the committed gate's command tolerance (m/s)
OBJ_TIE_TOL = 1e-4      # objective-gap tolerance for "distinct minimum" calls
PERTURB = 1e-6          # warm-start perturbation for the self-agreement probe


def _suite_cfg(chassis: str):
    import neo_mpc_planner2_tpu as mpc

    cfg = mpc.default_config().replace(
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
    if chassis == "mpo500":
        cfg = cfg.replace(min_vel_x=-0.8, max_vel_x=0.8,
                          min_vel_y=-0.8, max_vel_y=0.8, max_vel_trans=0.8)
    return cfg


# ---------------------------------------------------------------------------
# Oracle side (runs in pool workers; numpy/scipy only)
# ---------------------------------------------------------------------------

_WORKER = {}


def _init_worker(cfg_bytes):
    import pickle

    _WORKER["cfg"] = pickle.loads(cfg_bytes)


def _oracle_one(task):
    """Solve one scenario with the scipy oracle + K perturbed-warm-start
    re-solves for the self-agreement probe. Returns plain floats."""
    from neo_mpc_planner2_tpu.oracle import NpCostmap, NpScenario, OracleServer

    (idx, pose, carrot, goal, vel, fp_np, cm_data, cm_origin, cm_res,
     switch_opt, n_perturb, seed) = task
    cfg = _WORKER["cfg"]
    npcm = NpCostmap(cm_data, cm_origin, cm_res)
    nps = NpScenario(pose, carrot, goal, vel, fp_np, npcm,
                     switch_opt=switch_opt, control_interval=1 / 30)

    srv = OracleServer(cfg)
    cmd, diag = srv.solve(nps, 1 / 30)

    # Self-agreement: fresh servers, warm start perturbed by +/-PERTURB.
    rng = np.random.default_rng(seed)
    self_diff = 0.0
    for _ in range(n_perturb):
        srv_p = OracleServer(cfg)
        # Pre-seed old_goal so the new-goal reset does not zero the perturbed
        # guess, then perturb.
        srv_p.old_goal = goal.copy()
        srv_p.initial_guess = (np.zeros(cfg.control_steps * 3)
                               + rng.choice([-PERTURB, PERTURB],
                                            cfg.control_steps * 3))
        cmd_p, _ = srv_p.solve(nps, 1 / 30)
        self_diff = max(self_diff, float(np.abs(cmd_p - cmd).max()))

    return {
        "idx": int(idx),
        "cmd": [float(v) for v in cmd],
        "fun": diag["fun"],
        "success": diag["success"],
        "nit": diag["nit"],
        "collision": bool(diag["collision"]),
        "collision_footprint": bool(diag["collision_footprint"]),
        "self_diff": self_diff,
    }


# ---------------------------------------------------------------------------
# Device side (one vmapped dispatch)
# ---------------------------------------------------------------------------

def _device_solves(cfg, sb, n):
    import jax
    import jax.numpy as jnp

    import neo_mpc_planner2_tpu as mpc
    from neo_mpc_planner2_tpu.engine import init_state, solve_step
    from neo_mpc_planner2_tpu.ops.pursuit import pursuit_tick

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
    st = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), init_state(cfg))
    step = jax.jit(jax.vmap(lambda s, sc: solve_step(
        cfg, s, sc, jnp.float32(1 / 30), solver=solver)))
    out = step(st, scen)
    return pr, out


def run_suite(name, chassis, n, seed, workers, n_perturb, lethal_threshold=None,
              pose_jitter=0.05, control_steps=None):
    import pickle

    import jax
    import numpy as np

    from neo_mpc_planner2_tpu.ops.footprint import Footprint
    from neo_mpc_planner2_tpu.scenarios import (
        MPO500_LENGTH, MPO500_WIDTH, MPO700_LENGTH, MPO700_WIDTH,
        make_scenario_batch)

    cfg = _suite_cfg(chassis)
    if control_steps is not None:
        cfg = cfg.replace(control_steps=control_steps)
    L, W = ((MPO500_LENGTH, MPO500_WIDTH) if chassis == "mpo500"
            else (MPO700_LENGTH, MPO700_WIDTH))
    fp_dev = Footprint.rectangle(L, W, cfg.max_footprint_vertices)
    sb = make_scenario_batch(cfg, n, seed=seed, map_size=48, plan_points=48,
                             lethal_threshold=lethal_threshold,
                             pose_jitter=pose_jitter, footprint=fp_dev)

    t0 = time.time()
    pr, out = _device_solves(cfg, sb, n)
    cmd_dev = np.asarray(out.cmd_vel, float)
    fun_dev = np.asarray(out.fun, float)
    conv_dev = np.asarray(out.solver_converged)
    plan_empty = np.asarray(pr.plan_empty)
    lethal = np.asarray(pr.lethal)
    carrot = np.asarray(pr.carrot_pose, float)
    closer = np.asarray(pr.closer_to_goal)
    t_dev = time.time() - t0
    print(f"[{name}] device: {n} solves in one dispatch, {t_dev:.1f}s")

    hl, hw = L / 2, W / 2
    fp_np = np.array([[hl, hw], [-hl, hw], [-hl, -hw], [hl, -hw]])
    goal = np.asarray(sb.plan.poses, float)[
        np.arange(n), np.asarray(sb.plan.n_valid) - 1]

    tasks = []
    for i in range(n):
        if plan_empty[i] or lethal[i]:
            continue
        tasks.append((
            i, np.asarray(sb.robot_pose[i], float), carrot[i], goal[i],
            np.asarray(sb.current_vel[i], float), fp_np,
            np.asarray(sb.costmap.data[i], float),
            np.asarray(sb.costmap.origin[i], float),
            float(sb.costmap.resolution[i]), bool(closer[i]),
            n_perturb, seed * 100003 + i))

    t0 = time.time()
    cfg_bytes = pickle.dumps(cfg)
    with mp.get_context("spawn").Pool(workers, _init_worker,
                                      (cfg_bytes,)) as pool:
        oracle_rows = pool.map(_oracle_one, tasks, chunksize=4)
    print(f"[{name}] oracle: {len(tasks)} solves x {1 + n_perturb} "
          f"starts on {workers} workers, {time.time() - t0:.1f}s")

    rows = []
    for o in oracle_rows:
        i = o["idx"]
        diff = float(np.abs(cmd_dev[i] - np.asarray(o["cmd"])).max())
        gap = fun_dev[i] - o["fun"]  # device minus oracle objective
        rows.append({
            "idx": i,
            "cmd_diff": diff,
            "obj_gap": float(gap),
            "matched": diff < CMD_TOL,
            "scipy_success": o["success"],
            "scipy_nit": o["nit"],
            "scipy_self_diff": o["self_diff"],
            "device_converged": bool(conv_dev[i]),
            "collision": o["collision"] or o["collision_footprint"],
        })

    checked = len(rows)
    matched = sum(r["matched"] for r in rows)
    diffs = np.array([r["cmd_diff"] for r in rows])
    self_diffs = np.array([r["scipy_self_diff"] for r in rows])
    unmatched = [r for r in rows if not r["matched"]]
    # Classification of unmatched commands.
    dev_better = [r for r in unmatched if r["obj_gap"] < -OBJ_TIE_TOL]
    ora_better = [r for r in unmatched if r["obj_gap"] > OBJ_TIE_TOL]
    tie = [r for r in unmatched
           if -OBJ_TIE_TOL <= r["obj_gap"] <= OBJ_TIE_TOL]
    self_flaky = [r for r in unmatched if r["scipy_self_diff"] >= CMD_TOL]

    summary = {
        "suite": name,
        "n_scenarios": n,
        "checked": checked,
        "matched": matched,
        "matched_frac": matched / max(checked, 1),
        "cmd_diff_p50": float(np.percentile(diffs, 50)) if checked else None,
        "cmd_diff_p90": float(np.percentile(diffs, 90)) if checked else None,
        "cmd_diff_p99": float(np.percentile(diffs, 99)) if checked else None,
        "cmd_diff_max": float(diffs.max()) if checked else None,
        "scipy_self_agree_frac": float((self_diffs < CMD_TOL).mean())
        if checked else None,
        "scipy_self_diff_max": float(self_diffs.max()) if checked else None,
        "unmatched": {
            "count": len(unmatched),
            "device_better_objective": len(dev_better),
            "oracle_better_objective": len(ora_better),
            "objective_tie": len(tie),
            "scipy_self_disagrees_too": len(self_flaky),
            "scipy_failed": sum(not r["scipy_success"] for r in unmatched),
            "worst_oracle_better_gap": float(max(
                (r["obj_gap"] for r in ora_better), default=0.0)),
        },
        "rows_unmatched": sorted(
            ({k: r[k] for k in ("idx", "cmd_diff", "obj_gap", "scipy_success",
                                "scipy_nit", "scipy_self_diff",
                                "device_converged", "collision")}
             for r in unmatched),
            key=lambda r: -r["cmd_diff"]),
    }
    print(f"[{name}] matched {matched}/{checked} "
          f"(frac={summary['matched_frac']:.3f}), "
          f"p99 diff {summary['cmd_diff_p99']:.2e}, "
          f"scipy self-agree {summary['scipy_self_agree_frac']:.3f}, "
          f"unmatched: dev-better {len(dev_better)} / ora-better "
          f"{len(ora_better)} / tie {len(tie)}")
    return summary


# ---------------------------------------------------------------------------
# Sequence parity: T stateful ticks per scenario, both sides fed IDENTICAL
# per-tick inputs (pose/carrot/vel from one shared pursuit stream driven by
# the device's commands), each side evolving its own warm start / last_control
# / stuck state. Divergence can only compound through that internal state —
# exactly the pipeline the deployment runs (py:349-403 every tick).
# ---------------------------------------------------------------------------

def _oracle_sequence(task):
    from neo_mpc_planner2_tpu.oracle import NpCostmap, NpScenario, OracleServer

    (idx, inputs, fp_np, cm_data, cm_origin, cm_res) = task
    cfg = _WORKER["cfg"]
    npcm = NpCostmap(cm_data, cm_origin, cm_res)
    srv = OracleServer(cfg)
    cmds, funs, succ = [], [], []
    for (pose, carrot, goal, vel, sw) in inputs:
        nps = NpScenario(pose, carrot, goal, vel, fp_np, npcm,
                         switch_opt=bool(sw), control_interval=1 / 30)
        cmd, diag = srv.solve(nps, 1 / 30)
        cmds.append([float(v) for v in cmd])
        funs.append(float(diag["fun"]))
        succ.append(bool(diag["success"]))
    return {"idx": int(idx), "cmds": cmds, "funs": funs, "success": succ}


def run_sequence_suite(name, chassis, n, ticks, seed, workers):
    import pickle

    import jax
    import jax.numpy as jnp

    import neo_mpc_planner2_tpu as mpc
    from neo_mpc_planner2_tpu.engine import init_state, solve_step
    from neo_mpc_planner2_tpu.ops.pursuit import pursuit_tick
    from neo_mpc_planner2_tpu.ops.rollout import rollout
    from neo_mpc_planner2_tpu.ops.footprint import Footprint
    from neo_mpc_planner2_tpu.scenarios import (
        MPO500_LENGTH, MPO500_WIDTH, MPO700_LENGTH, MPO700_WIDTH,
        make_scenario_batch)

    cfg = _suite_cfg(chassis)
    L, W = ((MPO500_LENGTH, MPO500_WIDTH) if chassis == "mpo500"
            else (MPO700_LENGTH, MPO700_WIDTH))
    fp_dev = Footprint.rectangle(L, W, cfg.max_footprint_vertices)
    sb = make_scenario_batch(cfg, n, seed=seed, map_size=48, plan_points=48,
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

    state = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape),
                         init_state(cfg))
    pose = sb.robot_pose
    vel = sb.current_vel
    start = jnp.zeros((n,), jnp.int32)
    slow = jnp.zeros((n,), bool)
    dt = jnp.float32(1 / 30)

    t0 = time.time()
    dev_cmds = np.zeros((ticks, n, 3))
    dev_funs = np.zeros((ticks, n))
    goal_dist = np.zeros((ticks, n))  # robot->goal distance entering tick t
    gated = np.zeros((n,), bool)     # any tick hit a plugin gate: excluded
    seq_inputs = [[] for _ in range(n)]
    for t in range(ticks):
        pr = tick(sb.plan, start, slow, pose, sb.costmap, sb.footprint)
        scen = jax.vmap(lambda p, c, g, v, fp, cm, sw: mpc.Scenario.create(
            p, c, g, v, fp, cm, switch_opt=sw, control_interval=1 / 30))(
            pose, pr.carrot_pose, goal, vel, sb.footprint, sb.costmap,
            pr.closer_to_goal)
        out = step(state, scen)
        state = out.state
        gated |= np.asarray(pr.plan_empty) | np.asarray(pr.lethal)
        cmd = np.asarray(out.cmd_vel, float)
        dev_cmds[t] = cmd
        dev_funs[t] = np.asarray(out.fun, float)
        pose_np = np.asarray(pose, float)
        goal_dist[t] = np.hypot(pose_np[:, 0] - goal_np[:, 0],
                                pose_np[:, 1] - goal_np[:, 1])
        carrot_np = np.asarray(pr.carrot_pose, float)
        closer_np = np.asarray(pr.closer_to_goal)
        vel_np = np.asarray(vel, float)
        for i in range(n):
            seq_inputs[i].append((pose_np[i], carrot_np[i], goal_np[i],
                                  vel_np[i], bool(closer_np[i])))
        # Plant: integrate the DEVICE command; both sides see this pose.
        pose = jax.vmap(lambda c, p: rollout(c[None, :], dt, p)[0])(
            out.cmd_vel, pose)
        vel = out.cmd_vel
        start = pr.new_start
        slow = jnp.where(pr.plan_empty, slow, pr.slow_down)
    print(f"[{name}] device: {n} lanes x {ticks} stateful ticks, "
          f"{time.time() - t0:.1f}s")

    hl, hw = L / 2, W / 2
    fp_np = np.array([[hl, hw], [-hl, hw], [-hl, -hw], [hl, -hw]])
    tasks = [(i, seq_inputs[i], fp_np,
              np.asarray(sb.costmap.data[i], float),
              np.asarray(sb.costmap.origin[i], float),
              float(sb.costmap.resolution[i]))
             for i in range(n) if not gated[i]]
    t0 = time.time()
    cfg_bytes = pickle.dumps(cfg)
    with mp.get_context("spawn").Pool(workers, _init_worker,
                                      (cfg_bytes,)) as pool:
        rows = pool.map(_oracle_sequence, tasks, chunksize=2)
    print(f"[{name}] oracle: {len(tasks)} sequences on {workers} workers, "
          f"{time.time() - t0:.1f}s")

    diffs = []      # (scenario, tick) command diffs
    per_tick = np.zeros((ticks,))
    per_tick_n = 0
    worst_seq = 0.0
    # Unmatched-tick classification (mirrors the single-tick study): both
    # sides minimize the SAME per-tick objective (the harness feeds identical
    # pose/carrot/vel; only warm-start and filter state differ), so the
    # achieved-objective gap says whether an unmatched command is a near-tie
    # arg-min (flat objective, e.g. the goal phase) or a real solver loss.
    un_gap, un_dist, un_fail = [], [], 0
    all_dist = []
    for o in rows:
        i = o["idx"]
        d = np.abs(dev_cmds[:, i, :] - np.asarray(o["cmds"])).max(axis=-1)
        diffs.extend(d.tolist())
        per_tick += (d < CMD_TOL)
        per_tick_n += 1
        worst_seq = max(worst_seq, float(d.max()))
        all_dist.extend(goal_dist[:, i].tolist())
        ora_funs = np.asarray(o["funs"])
        for t in np.nonzero(d >= CMD_TOL)[0]:
            un_gap.append(float(dev_funs[t, i] - ora_funs[t]))
            un_dist.append(float(goal_dist[t, i]))
            un_fail += int(not o["success"][t])
    un_gap = np.asarray(un_gap)
    un_dist_a = np.asarray(un_dist)
    diffs = np.asarray(diffs)
    summary = {
        "suite": name,
        "mode": "sequence",
        "n_sequences": per_tick_n,
        "ticks": ticks,
        "checked": int(diffs.size),
        "matched": int((diffs < CMD_TOL).sum()),
        "matched_frac": float((diffs < CMD_TOL).mean()),
        "cmd_diff_p50": float(np.percentile(diffs, 50)),
        "cmd_diff_p99": float(np.percentile(diffs, 99)),
        "cmd_diff_max": float(diffs.max()),
        "matched_frac_per_tick": [round(float(v / max(per_tick_n, 1)), 4)
                                  for v in per_tick],
        "goal_dist_p50_all_m": float(np.percentile(all_dist, 50)),
        "unmatched": {
            "count": int(un_gap.size),
            "device_better_objective": int((un_gap < -OBJ_TIE_TOL).sum()),
            "oracle_better_objective": int((un_gap > OBJ_TIE_TOL).sum()),
            "objective_tie": int((np.abs(un_gap) <= OBJ_TIE_TOL).sum()),
            "worst_oracle_better_gap": float(
                un_gap[un_gap > OBJ_TIE_TOL].max()) if
            (un_gap > OBJ_TIE_TOL).any() else 0.0,
            "scipy_failed": int(un_fail),
            "goal_dist_p50_m": float(np.percentile(un_dist_a, 50))
            if un_dist_a.size else None,
            "goal_dist_p90_m": float(np.percentile(un_dist_a, 90))
            if un_dist_a.size else None,
        },
    }
    u = summary["unmatched"]
    print(f"[{name}] sequence parity: {summary['matched']}/"
          f"{summary['checked']} (frac={summary['matched_frac']:.3f}), "
          f"p99 {summary['cmd_diff_p99']:.2e}, last-tick frac "
          f"{summary['matched_frac_per_tick'][-1]:.3f}; unmatched: "
          f"dev-better {u['device_better_objective']} / ora-better "
          f"{u['oracle_better_objective']} / tie {u['objective_tie']}, "
          f"goal-dist p50 {u['goal_dist_p50_m']}")
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--workers", type=int, default=max(2, os.cpu_count() - 1))
    ap.add_argument("--perturb-reps", type=int, default=3)
    ap.add_argument("--out", default="PARITY_REPORT.json")
    ap.add_argument("--suites", default="mpo700,mpo500,footprint,cs5,sequence")
    ap.add_argument("--sequence-n", type=int, default=50)
    ap.add_argument("--sequence-ticks", type=int, default=10)
    # Merge this run's suites into an existing report instead of replacing
    # it (e.g. append a T=50 long-horizon sequence section to the committed
    # 300-scenario study without re-running it). A suite with the same
    # (suite, mode, ticks) key is replaced; others are preserved.
    ap.add_argument("--append", action="store_true")
    args = ap.parse_args()

    results = []
    suites = args.suites.split(",")
    if "mpo700" in suites:
        results.append(run_suite("mpo700", "mpo700", args.n, args.seed,
                                 args.workers, args.perturb_reps))
    if "mpo500" in suites:
        results.append(run_suite("mpo500", "mpo500", args.n, args.seed + 99,
                                 args.workers, args.perturb_reps))
    if "footprint" in suites:
        # The lethal-adjacent regime (footprint branch + x1000 discontinuities):
        # reported separately — near exact-equality cliffs distinct minima are
        # expected, so this row contextualizes rather than gates.
        results.append(run_suite("lethal_adjacent", "mpo700", args.n,
                                 args.seed + 198, args.workers,
                                 args.perturb_reps, lethal_threshold=0.5,
                                 pose_jitter=0.7))
    if "cs5" in suites:
        # Horizon-robustness axis: control_steps=5 over the same 0.8 s
        # horizon (decision vector 15, the m=15 kernel path end-to-end).
        results.append(run_suite("mpo700_cs5", "mpo700", args.n,
                                 args.seed + 555, args.workers,
                                 args.perturb_reps, control_steps=5))
    if "sequence" in suites:
        results.append(run_sequence_suite(
            "mpo700_sequence", "mpo700", args.sequence_n,
            args.sequence_ticks, args.seed + 297, args.workers))

    report = {
        "cmd_tol": CMD_TOL,
        "obj_tie_tol": OBJ_TIE_TOL,
        "perturb": PERTURB,
        "perturb_reps": args.perturb_reps,
        "suites": results,
    }
    if args.append and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)

        def key(s):
            return (s.get("suite"), s.get("mode"), s.get("ticks"))

        fresh = {key(s) for s in results}
        report["suites"] = ([s for s in prev.get("suites", [])
                             if key(s) not in fresh] + results)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
