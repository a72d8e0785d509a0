"""Record golden command sequences for drift detection across rounds.

Runs the canonical MPO-700 suite (deterministic, scenarios.py) through the
full pipeline on CPU and stores the resulting commands. tests/test_golden.py
compares future runs against these; regenerate ONLY on intentional behavior
changes:

    env -u PYTHONPATH JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/record_golden.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import pathlib

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.scenarios import make_scenario_batch
from neo_mpc_planner2_tpu.simulation import batch_simulate

GOLDEN = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"


def suite_cfg():
    return mpc.default_config().replace(
        prediction_horizon=0.8, control_steps=3, opt_tolerance=1e-3,
        footprint_edge_samples=8, max_plan_points=64, solver_max_iters=40,
        acc_x_limit=2.5, acc_y_limit=2.5, acc_theta_limit=3.0,
        min_vel_x=-0.7, min_vel_y=-0.7, min_vel_theta=-0.7,
        max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7, max_vel_theta=0.7,
        w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
        w_costmap=0.05, w_footprint=0.0,
        lookahead_dist_min=0.4, lookahead_dist_max=0.4,
        lookahead_dist_close_to_goal=0.4,
    )


def run_suite(n_ticks: int = 30, batch: int = 8):
    cfg = suite_cfg()
    sb = make_scenario_batch(cfg, batch, seed=2026, map_size=48, plan_points=32)
    res = jax.jit(lambda: batch_simulate(cfg, sb, n_ticks))()
    return np.asarray(res.cmds), np.asarray(res.goal_dist)


def main() -> None:
    cmds, goal_dist = run_suite()
    GOLDEN.mkdir(exist_ok=True)
    np.savez(GOLDEN / "mpo700_closed_loop.npz", cmds=cmds, goal_dist=goal_dist)
    print(f"recorded {cmds.shape} commands -> {GOLDEN/'mpo700_closed_loop.npz'}")
    print("final goal dists:", np.round(goal_dist[:, -1], 3))


if __name__ == "__main__":
    main()
