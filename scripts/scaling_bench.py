"""Scaling benchmark: closed-loop solves/s at increasing device counts.

BASELINE.json asks for ≥80 % linear solves/s scaling from 1 chip to hosts.
This script measures sustained closed-loop throughput on device subsets
(1, 2, 4, … all) with the per-device batch held fixed (weak scaling — the
deployment regime: more chips ⇒ more robots). Prints one JSON line per mesh
size plus a summary efficiency.

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
    """Resource-honest weak scaling on the CPU virtual mesh: re-exec one
    child per mesh size under `taskset` with exactly one physical core per
    virtual device, so per-device compute is held constant while the device
    count grows (without pinning, XLA's shared host thread pool lets ONE
    device consume every core and the curve measures core saturation, not
    sharding overhead). Efficiency = sps(N)/(N·sps(1))."""
    ncores = os.cpu_count() or 1
    sizes = []
    n = 1
    while n <= ncores:
        sizes.append(n)
        n *= 2
    results = []
    for nd in sizes:
        cores = ",".join(str(c) for c in range(nd))
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={nd}"
        env["NEO_MPC_SCALING_CHILD"] = "1"
        out = subprocess.run(
            ["taskset", "-c", cores, sys.executable, __file__,
             "--batch-per-device", str(args.batch_per_device),
             "--ticks", str(args.ticks), "--map-size", str(args.map_size)],
            env=env, capture_output=True, text=True, check=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
        print(json.dumps(results[-1]), flush=True)
    base = results[0]["solves_per_sec"]
    for r in results[1:]:
        eff = r["solves_per_sec"] / (base * r["devices"])
        print(json.dumps({"pinned_scaling_efficiency": round(eff, 3),
                          "devices": r["devices"],
                          "cores_per_device": 1}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-device", type=int, default=256)
    ap.add_argument("--ticks", type=int, default=10)
    ap.add_argument("--map-size", type=int, default=48)
    ap.add_argument("--pinned", action="store_true",
                    help="CPU virtual mesh: one core per device via taskset")
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

    results = []
    for nd in sizes:
        mesh = make_mesh(devices[:nd], hosts=1)
        B = args.batch_per_device * nd
        sb = make_scenario_batch(cfg, B, seed=0, map_size=args.map_size,
                                 plan_points=24)
        sb = type(sb)(*[shard_batch(x, mesh) for x in sb])
        sim = jax.jit(lambda b, t: batch_simulate(cfg, b, t), static_argnums=1)
        run = sim(sb, args.ticks)
        np.asarray(jax.device_get(run.cmds[:1, -1]))  # compile + barrier
        t0 = time.perf_counter()
        run = sim(sb, args.ticks)
        np.asarray(jax.device_get(run.cmds[:1, -1]))
        dt = time.perf_counter() - t0
        sps = B * args.ticks / dt
        results.append({"devices": nd, "batch": B,
                        "solves_per_sec": round(sps, 1)})
        print(json.dumps(results[-1]), flush=True)

    if len(results) > 1:
        base = results[0]["solves_per_sec"]
        eff = results[-1]["solves_per_sec"] / (base * results[-1]["devices"])
        print(json.dumps({"scaling_efficiency": round(eff, 3),
                          "from_devices": 1,
                          "to_devices": results[-1]["devices"]}), flush=True)


if __name__ == "__main__":
    main()
