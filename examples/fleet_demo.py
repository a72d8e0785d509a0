"""Demo: a fleet of robots runs the full FollowPath loop on a device mesh.

BASELINE.json's pod configuration — thousands of scenarios (obstacle layouts,
plans, weight grids) per control step, sharded over every available chip, with
fleet metrics reduced by XLA collectives. On one chip it batches; on a pod
slice the same code shards over ICI.

    python examples/fleet_demo.py --batch 512 --ticks 60
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python examples/fleet_demo.py --batch 64 --ticks 20
"""

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--ticks", type=int, default=60)
    args = ap.parse_args()

    import jax

    import neo_mpc_planner2_tpu as mpc
    from neo_mpc_planner2_tpu.parallel.sharding import ShardedEngine, make_mesh
    from neo_mpc_planner2_tpu.scenarios import make_scenario_batch

    cfg = mpc.default_config().replace(
        prediction_horizon=0.8, opt_tolerance=1e-3, footprint_edge_samples=16,
        max_plan_points=64, solver_max_iters=8, costmap_sampling="onehot",
        min_vel_x=-0.7, min_vel_y=-0.7, min_vel_theta=-0.7,
        max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7, max_vel_theta=0.7,
        w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
        w_costmap=0.05, w_footprint=0.0,
        lookahead_dist_min=0.4, lookahead_dist_max=0.4,
        lookahead_dist_close_to_goal=0.4,
    )
    mesh = make_mesh()
    print(f"mesh: {mesh.devices.shape} over {len(jax.devices())} device(s)")
    eng = ShardedEngine(cfg, mesh)

    sb = make_scenario_batch(cfg, args.batch, seed=7, map_size=64, plan_points=48)
    state = eng.shard(sb.state)
    plan = eng.shard(sb.plan)
    rest = tuple(eng.shard(x) for x in (sb.robot_pose, sb.current_vel,
                                        sb.costmap, sb.footprint, sb.delta_t))
    poses = rest[0]

    t0 = time.time()
    for t in range(args.ticks):
        out, metrics = eng.step(state, plan, poses, *rest[1:])
        state = out.state
        # Integrate each robot one control period (same omni model).
        import jax.numpy as jnp
        from neo_mpc_planner2_tpu.ops.rollout import rollout

        poses = jax.jit(jax.vmap(
            lambda p, c: rollout(c[None, :], jnp.float32(cfg.control_interval), p)[0]
        ))(poses, out.cmd_vel)
        if t % 10 == 0:
            print(f"tick {t:3d}: mean cost {float(metrics.mean_cost):.4f} "
                  f"converged {float(metrics.converged_frac):.2f} "
                  f"collisions {float(metrics.collision_frac):.3f} "
                  f"mean speed {float(metrics.mean_cmd_speed):.3f} m/s")
    wall = time.time() - t0
    rate = args.batch * args.ticks / wall
    print(f"\n{args.batch} robots × {args.ticks} ticks in {wall:.1f} s "
          f"= {rate:.0f} solves/s")


if __name__ == "__main__":
    main()
