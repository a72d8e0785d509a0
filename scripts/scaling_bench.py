"""Scaling benchmark: closed-loop solves/s at increasing device counts.

BASELINE.json asks for ≥80 % linear solves/s scaling from 1 chip to hosts.
This script measures sustained closed-loop throughput on device subsets
(1, 2, 4, … all) with the per-device batch held fixed (weak scaling — the
deployment regime: more chips ⇒ more robots). Prints one JSON line per mesh
size plus a summary efficiency.

Protocol (round-4 revision): the rounds-2/3 protocol compared CHILDREN —
sps(N devices, N cores) / (N · sps(1 device, 1 core)) — and measured 1.15-1.33
"efficiency" because the 1-device child wears every per-process fixed cost
(runtime threads contending with its single compute core) that the N-device
children amortize. A measurement that exceeds 1.0 by construction cannot
demonstrate the ≥0.8 target. Now every efficiency is normalized INSIDE one
process: the N-device child (pinned to N cores) measures both its N-device
steady-state per-tick time and a same-process 1-device baseline (per-device
batch on device[0], with all N cores available — strictly more resources per
device than any lane of the sharded run gets, and measured single-threaded
for this program shape: 9.8k solves/s on 1 core vs 8.5k on 4). Efficiency =
t_baseline / t_sharded ≤ 1 up to noise: the sharded run adds work and
contention, never removes it. Steady state = min over repeats after a full
warmup run (compile + first execution excluded).

On real hardware run under the default env; in this repo's single-chip
environment it reports the 1-chip point, and the CPU virtual mesh
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
demonstrates the scaling harness itself.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def pinned_main(args) -> None:
    """Resource-honest weak scaling on the CPU virtual mesh: one child per
    mesh size under `taskset` with one physical core per virtual device.
    Each child reports its own in-process 1-device baseline and efficiency
    (see module docstring); this parent just runs the ladder and echoes.
    Device counts beyond the core count run 2×-oversubscribed and are
    annotated + excluded from any gate (their efficiency conflates core
    starvation with sharding overhead)."""
    ncores = os.cpu_count() or 1
    sizes = []
    n = 1
    while n <= args.max_devices:
        sizes.append(n)
        n *= 2
    for nd in sizes:
        cores = ",".join(str(c) for c in range(min(nd, ncores)))
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={nd}"
        env["NEO_MPC_SCALING_CHILD"] = "1"
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        out = subprocess.run(
            ["taskset", "-c", cores, sys.executable, __file__,
             "--batch-per-device", str(args.batch_per_device),
             "--ticks", str(args.ticks), "--map-size", str(args.map_size),
             "--repeats", str(args.repeats),
             "--ticks-per-dispatch", str(args.ticks_per_dispatch)],
            env=env, capture_output=True, text=True, check=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        if nd > ncores:
            rec["oversubscribed"] = True  # cores < devices: excluded from gate
        print(json.dumps(rec), flush=True)


def _steady_time(fn, repeats: int) -> float:
    """Min wall time over `repeats` calls of fn (fn must end in a host fetch),
    after one un-timed warmup call (compile + first execution)."""
    fn()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-device", type=int, default=256)
    ap.add_argument("--ticks", type=int, default=10)
    ap.add_argument("--map-size", type=int, default=48)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--max-devices", type=int, default=8)
    ap.add_argument("--pinned", action="store_true",
                    help="CPU virtual mesh: one core per device via taskset")
    # Round-4 verdict item 4: the per-dispatch host sync is paid once per
    # --ticks scanned ticks, and on a zero-spare-core host the dispatch/fetch
    # edges are where scheduler jitter lands (every runtime thread preempts a
    # device core). K ticks per dispatch (one lax.scan, ONE fetch per K —
    # the state threading already allows it; simulation.py's quality chains
    # do exactly this) divides that straggler tax by K/--ticks, separating
    # sharding overhead from host-sync amplification. 0 = use --ticks
    # (the historical protocol).
    ap.add_argument("--ticks-per-dispatch", type=int, default=0)
    args = ap.parse_args()
    if args.pinned:
        pinned_main(args)
        return

    import jax

    import neo_mpc_planner2_tpu as mpc
    from neo_mpc_planner2_tpu.parallel.sharding import make_mesh, shard_batch
    from neo_mpc_planner2_tpu.scenarios import make_scenario_batch
    from neo_mpc_planner2_tpu.simulation import batch_simulate

    cfg = mpc.default_config().replace(
        prediction_horizon=0.8, opt_tolerance=1e-3, footprint_edge_samples=16,
        max_plan_points=64, solver_max_iters=40, costmap_sampling="onehot",
        min_vel_x=-0.7, min_vel_y=-0.7, min_vel_theta=-0.7,
        max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7, max_vel_theta=0.7,
        w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
        w_costmap=0.05, w_footprint=0.0,
        lookahead_dist_min=0.4, lookahead_dist_max=0.4,
        lookahead_dist_close_to_goal=0.4,
    )

    devices = jax.devices()
    if os.environ.get("NEO_MPC_SCALING_CHILD"):
        sizes = [len(devices)]  # pinned child: measure exactly this mesh
    else:
        sizes = []
        n = 1
        while n <= len(devices):
            sizes.append(n)
            n *= 2
        if sizes[-1] != len(devices):
            sizes.append(len(devices))

    tpd = args.ticks_per_dispatch or args.ticks
    sim = jax.jit(lambda b, t: batch_simulate(cfg, b, t), static_argnums=1)

    def run_once(sb):
        run = sim(sb, tpd)
        np.asarray(jax.device_get(run.cmds[:1, -1]))  # real barrier

    results = []
    for nd in sizes:
        mesh = make_mesh(devices[:nd], hosts=1)
        B = args.batch_per_device * nd
        sb = make_scenario_batch(cfg, B, seed=0, map_size=args.map_size,
                                 plan_points=24)
        sb = type(sb)(*[shard_batch(x, mesh) for x in sb])
        t_shard = _steady_time(lambda: run_once(sb), args.repeats)
        sps = B * tpd / t_shard

        # Same-process 1-device baseline: the per-device batch on device[0],
        # with every core this child owns available to it. Strictly more
        # resources per device than the sharded run gives any lane, so
        # efficiency = t_base / t_shard cannot exceed 1 except by noise.
        sb1 = make_scenario_batch(cfg, args.batch_per_device, seed=0,
                                  map_size=args.map_size, plan_points=24)
        sb1 = jax.device_put(sb1, devices[0])
        t_base = _steady_time(lambda: run_once(sb1), args.repeats)

        rec = {"devices": nd, "batch": B,
               "ticks_per_dispatch": tpd,
               "solves_per_sec": round(sps, 1),
               "baseline_1dev_solves_per_sec": round(
                   args.batch_per_device * tpd / t_base, 1),
               "steady_tick_ms": round(t_shard / tpd * 1e3, 2),
               "efficiency": round(t_base / t_shard, 3)}
        results.append(rec)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
