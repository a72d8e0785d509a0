"""Benchmark: MPC solves/sec/chip + p99 single-solve latency on real hardware.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Baseline: the reference reports ~50 Hz sustained on an Intel i5
(/root/reference/README.md:6) — i.e. ~50 solves/s for ONE robot. This engine's
headline metric is batched solves/sec/chip at the same problem shape
(horizon 0.8 s, 3 control steps, costmap + footprint terms active), so
vs_baseline = solves_per_sec / 50.

Run on the TPU (default env), single process. CPU smoke: JAX_PLATFORMS=cpu.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--latency-reps", type=int, default=100)
    ap.add_argument("--map-size", type=int, default=120)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import neo_mpc_planner2_tpu as mpc
    from neo_mpc_planner2_tpu.parallel.sharding import ShardedEngine, make_mesh
    from neo_mpc_planner2_tpu.scenarios import make_scenario_batch

    cfg = mpc.default_config().replace(
        prediction_horizon=0.8, control_steps=3, opt_tolerance=1e-3,
        footprint_edge_samples=16, max_plan_points=64, solver_max_iters=40,
        min_vel_x=-0.7, min_vel_y=-0.7, min_vel_theta=-0.7,
        max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7, max_vel_theta=0.7,
        w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
        w_costmap=0.05, w_footprint=0.0,
        lookahead_dist_min=0.4, lookahead_dist_max=0.4,
        lookahead_dist_close_to_goal=0.4,
    )

    mesh = make_mesh()
    eng = ShardedEngine(cfg, mesh)

    # ---- batched throughput ----
    sb = make_scenario_batch(cfg, args.batch, seed=0, map_size=args.map_size,
                             plan_points=64)
    state = eng.shard(sb.state)
    plan = eng.shard(sb.plan)
    rest = tuple(eng.shard(x) for x in (sb.robot_pose, sb.current_vel,
                                        sb.costmap, sb.footprint, sb.delta_t))

    out, metrics = eng.step(state, plan, *rest)  # compile + warmup
    jax.block_until_ready(out.cmd_vel)
    state = out.state

    t0 = time.perf_counter()
    for _ in range(args.steps):
        out, metrics = eng.step(state, plan, *rest)
        state = out.state
    jax.block_until_ready(out.cmd_vel)
    dt_total = time.perf_counter() - t0
    n_dev = len(jax.devices())
    solves_per_sec_per_chip = args.batch * args.steps / dt_total / n_dev

    # ---- single-solve p99 latency (dispatch included) ----
    # Measured through a batch-1 vmapped step: identical math, and the
    # unbatched scalar program hits an XLA compile-time pathology (~150 s)
    # while the vmapped one compiles in seconds.
    eng1 = mpc.MpcEngine(cfg)
    st1 = eng1.init_batch_state(1)
    plan1 = jax.tree.map(lambda x: x[:1], plan)
    a1 = tuple(jax.tree.map(lambda x: x[:1], a) for a in rest)
    o = eng1.batch_step(st1, plan1, *a1)  # compile
    jax.block_until_ready(o.cmd_vel)
    lats = []
    for _ in range(args.latency_reps):
        t0 = time.perf_counter()
        o = eng1.batch_step(st1, plan1, *a1)
        jax.block_until_ready(o.cmd_vel)
        lats.append(time.perf_counter() - t0)
    p99_ms = float(np.percentile(np.array(lats) * 1e3, 99))
    p50_ms = float(np.percentile(np.array(lats) * 1e3, 50))

    print(json.dumps({
        "metric": "MPC solves/sec/chip (horizon 0.8s, 3 steps)",
        "value": round(solves_per_sec_per_chip, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_sec_per_chip / 50.0, 2),
        "batch": args.batch,
        "devices": n_dev,
        "p99_solve_ms": round(p99_ms, 3),
        "p50_solve_ms": round(p50_ms, 3),
        "converged_frac": round(float(metrics.converged_frac), 4),
    }))


if __name__ == "__main__":
    main()
