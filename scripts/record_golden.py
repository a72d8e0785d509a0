"""Record golden command sequences for drift detection across rounds.

Runs the canonical MPO-700 suite (deterministic, scenarios.py) through the
full pipeline on CPU and stores the resulting commands — once per VARIANT,
covering the operating points the perf work actually touches (round-2
verdict: one golden config left every benched mode guarded only by the slow
oracle suites). tests/test_golden.py compares future runs against these;
regenerate ONLY on intentional behavior changes:

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

# Golden variants: name -> (config overrides, run options). Each guards a
# benched operating point (PERF.md):
#  - footprint_live: w_footprint=2000 keeps the parity footprint term from
#    being constant-folded (the bench headline's configuration), with lethal
#    cells present so the exact-equality branch is reachable;
#  - u8_source: the uint8 raw-scale gather source (solver_costmap_u8);
#  - two_phase_ls: the cap-8 + two-phase-Armijo bench operating point;
#  - rolling_window: nav2 rolling local-costmap sim mode (window re-centered
#    on the robot every tick over a 2x world map);
#  - adaptive_compact: the batch-level adaptive lockstep compaction path.
VARIANTS = {
    "mpo700_closed_loop": (dict(), dict()),
    # Observability note (round-3 review): in parity mode the footprint TERM
    # is a per-solve constant (CompatConfig.footprint_alias_noop), so
    # commands can NEVER observe w_footprint — what the golden must guard is
    # the footprint-cost EVALUATION feeding the ==1.0 collision gate. The
    # wide pose jitter + lethal blobs put several lanes' footprints ON
    # lethal cells, so gate regressions change recorded commands (verified:
    # this golden differs from the baseline).
    "footprint_live": (dict(w_footprint=2000.0),
                       dict(lethal_threshold=0.85, pose_jitter=0.45)),
    # w_costmap amplified so the u8 quantization of the off-grid blob values
    # perturbs accepted line-search steps — silently disabling the u8 source
    # then changes recorded commands (verified: differs from the same config
    # with u8 off).
    "u8_source": (dict(solver_costmap_u8=True, w_costmap=5.0), dict()),
    "two_phase_ls": (dict(solver_max_iters=8, solver_max_backtracks=7,
                          solver_ls_coarse_after=2,
                          solver_ls_coarse_factor=0.0625), dict()),
    "rolling_window": (dict(), dict(map_size=96, window_cells=48)),
    "adaptive_compact": (dict(solver_compact_adaptive=True,
                              solver_compact_min_batch=8), dict()),
}


def suite_cfg(**overrides):
    base = dict(
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
    base.update(overrides)
    return mpc.default_config().replace(**base)


def run_suite(n_ticks: int = 30, batch: int = 8, variant: str = "mpo700_closed_loop"):
    cfg_over, run_over = VARIANTS[variant]
    cfg = suite_cfg(**cfg_over)
    map_size = run_over.get("map_size", 48)
    window_cells = run_over.get("window_cells")
    sb = make_scenario_batch(
        cfg, batch, seed=2026, map_size=map_size, plan_points=32,
        lethal_threshold=run_over.get("lethal_threshold"),
        pose_jitter=run_over.get("pose_jitter", 0.05))
    res = jax.jit(lambda: batch_simulate(cfg, sb, n_ticks,
                                         window_cells=window_cells))()
    return np.asarray(res.cmds), np.asarray(res.goal_dist)


def main() -> None:
    GOLDEN.mkdir(exist_ok=True)
    for name in VARIANTS:
        cmds, goal_dist = run_suite(variant=name)
        np.savez(GOLDEN / f"{name}.npz", cmds=cmds, goal_dist=goal_dist)
        print(f"recorded {name}: {cmds.shape} commands, "
              f"final dists {np.round(goal_dist[:, -1], 3)}")


if __name__ == "__main__":
    main()
