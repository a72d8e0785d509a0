"""Weight-grid batching: one compiled executable serves a whole grid of cost
weights (BASELINE.json batched-axis requirement)."""

import numpy as np
import jax
import jax.numpy as jnp

import neo_mpc_planner2_tpu as mpc


def test_weights_override_matches_config(cfg, empty_costmap, footprint):
    """Scenario.weights must reproduce exactly what a config with those values
    produces."""
    obj_cfg = mpc.make_objective(cfg.replace(w_trans=0.3, w_control=0.2))
    w = mpc.Weights.from_config(cfg).replace(
        w_trans=jnp.float32(0.3), w_control=jnp.float32(0.2))
    scen_w = mpc.Scenario.create([0, 0, 0], [0.4, 0.1, 0.2], [1, 0.5, 0.3],
                                 [0.3, 0, 0], footprint, empty_costmap, weights=w)
    obj_base = mpc.make_objective(cfg)
    u = jnp.asarray(np.linspace(-0.3, 0.3, 9), jnp.float32)
    scen_plain = scen_w.replace(weights=None)
    v_override = float(obj_base(u, scen_w))
    v_config = float(obj_cfg(u, scen_plain))
    assert v_override == v_config


def test_weight_grid_batch_solves(cfg, empty_costmap, footprint):
    """vmap over a weight grid: heavier w_control pulls the solution toward the
    current velocity."""
    grid = mpc.Weights.grid(cfg, w_control=[0.0, 5.0])
    B = 2
    vel = jnp.asarray([0.1, 0.0, 0.0], jnp.float32)
    scen1 = mpc.Scenario.create([0, 0, 0], [0.6, 0.0, 0.0], [1, 0, 0],
                                vel, footprint, empty_costmap)
    scens = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), scen1)
    scens = scens.replace(weights=grid)
    solver = mpc.make_sqp_solver(cfg, mpc.make_objective(cfg), ftol=1e-8,
                                 max_iters=200)
    res = jax.jit(jax.vmap(solver))(jnp.zeros((B, 9)), scens)
    u = np.asarray(res.x).reshape(B, 3, 3)
    # w_control=0: free to run at the bound toward the carrot.
    assert u[0, 0, 0] > 0.5
    # w_control=5 (dominant): stick near current velocity 0.1.
    assert abs(u[1, 0, 0] - 0.1) < 0.05


def test_grid_shape():
    cfg = mpc.default_config()
    g = mpc.Weights.grid(cfg, w_trans=[0.5, 0.82], w_control=[0.01, 0.05, 0.2])
    assert g.w_trans.shape == (6,)
    assert g.w_orient.shape == (6,)
    np.testing.assert_allclose(np.unique(np.asarray(g.w_control)),
                               [0.01, 0.05, 0.2])
