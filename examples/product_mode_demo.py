"""Demo: the measured PRODUCT operating point — smooth bilinear objective +
true predicted footprint through the batched SQP (`mpc.product_config()`),
with the two round-5 levers on: the fused line-search wave and the per-solve
hoisted patch sampler. A small fleet drives around a graded obstacle field
to its goals; parity mode (reference-quirk-faithful) runs the same scenarios
for comparison.

    JAX_PLATFORMS=cpu python examples/product_mode_demo.py
"""

import numpy as np
import jax.numpy as jnp

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.ops.costmap import required_product_patch_halfwidth
from neo_mpc_planner2_tpu.scenarios import make_scenario_batch
from neo_mpc_planner2_tpu.simulation import batch_simulate


def main() -> None:
    sample = dict(
        prediction_horizon=0.8, control_steps=3, opt_tolerance=1e-3,
        footprint_edge_samples=16, max_plan_points=64,
        acc_x_limit=2.5, acc_y_limit=2.5, acc_theta_limit=3.0,
        min_vel_x=-0.7, min_vel_y=-0.7, min_vel_theta=-0.7,
        max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7, max_vel_theta=0.7,
        w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
        w_costmap=0.05, w_footprint=2000.0,
        lookahead_dist_min=0.4, lookahead_dist_max=0.4,
        lookahead_dist_close_to_goal=0.4,
    )
    pcfg = mpc.product_config().replace(**sample)
    # Size the patch from the map resolution + MPO-700 circumradius (0.46 m).
    pcfg = pcfg.replace(solver_costmap_patch=(
        required_product_patch_halfwidth(pcfg, 0.05, 0.46)))
    parity_cfg = mpc.fleet_config().replace(**sample)

    n, ticks = 16, 150
    sb = make_scenario_batch(pcfg, n, seed=11, map_size=64, plan_points=48,
                             plan_length_range=(0.8, 1.1),
                             clear_corridor_m=0.55, center_on="plan")

    run_p = batch_simulate(pcfg, sb, ticks, parity=False)
    run_r = batch_simulate(parity_cfg, sb, ticks)

    for name, run in (("product", run_p), ("parity ", run_r)):
        d = np.asarray(run.goal_dist[:, -1])
        it = float(jnp.mean(jnp.asarray(run.solver_iters, jnp.float32)))
        print(f"{name}: {int((d < 0.10).sum())}/{n} goals within 10 cm, "
              f"median final dist {np.median(d)*100:.1f} cm, "
              f"mean solver iters {it:.1f}")

    # Product commands are smooth AND feasible.
    cmds = np.asarray(run_p.cmds)
    v = np.hypot(cmds[..., 0], cmds[..., 1])
    print(f"product max ||v||: {v.max():.3f} m/s "
          f"(bound {pcfg.max_vel_trans})")
    assert v.max() <= pcfg.max_vel_trans + 1e-3


if __name__ == "__main__":
    main()
