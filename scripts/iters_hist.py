"""Per-tick SQP iteration-count distribution at an operating point.

Answers "when does the alive set collapse?" for lockstep-depth levers
(adaptive compaction): a lane with iters=k was alive through full-batch
iterations 1..k, so frac(iters > k) is the alive fraction entering
iteration k+1. Closed loop on the chip, warm ticks only (tick 0 is cold).

  PYTHONPATH=/root/repo python scripts/iters_hist.py --max-iters 8
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=20)
    ap.add_argument("--map-size", type=int, default=64)
    ap.add_argument("--max-iters", type=int, default=8)
    args = ap.parse_args()

    import jax

    import neo_mpc_planner2_tpu as mpc
    from neo_mpc_planner2_tpu.scenarios import make_scenario_batch
    from neo_mpc_planner2_tpu.simulation import batch_simulate

    cfg = mpc.fleet_config().replace(
        prediction_horizon=0.8, control_steps=3, opt_tolerance=1e-3,
        footprint_edge_samples=16, max_plan_points=64,
        solver_max_iters=args.max_iters, solver_compact_adaptive=False,
        min_vel_x=-0.7, min_vel_y=-0.7, min_vel_theta=-0.7,
        max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7, max_vel_theta=0.7,
        w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
        w_costmap=0.05, w_footprint=2000.0, costmap_sampling="onehot",
        solver_costmap_u8=False,
        lookahead_dist_min=0.4, lookahead_dist_max=0.4,
        lookahead_dist_close_to_goal=0.4)
    sb = make_scenario_batch(cfg, args.batch, seed=0, map_size=args.map_size,
                             plan_points=64, maps_on_device=True)
    run = jax.jit(lambda b, t: batch_simulate(cfg, b, t),
                  static_argnums=1)(sb, args.ticks)
    iters = np.asarray(jax.device_get(run.solver_iters))  # (B, T)
    warm = iters[:, 1:]  # drop the cold tick
    B = warm.shape[0] * warm.shape[1]
    print(f"warm solves: {B}  mean iters {warm.mean():.2f}  "
          f"max {warm.max()}")
    for k in range(args.max_iters + 1):
        alive = (warm > k).mean()
        print(f"alive entering iter {k + 1:>2}: {alive:8.4f} "
              f"({alive * args.batch:7.0f} lanes of {args.batch})")


if __name__ == "__main__":
    main()
