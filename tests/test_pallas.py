"""Pallas kernel tests (interpret mode on CPU): the fused footprint-cost
kernel must match the reference (gather) path bit-for-bit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.ops.footprint import footprint_cost, transform_footprint
from neo_mpc_planner2_tpu.ops.pallas_kernels import footprint_cost_batch_pallas


def _batch(rng, B=4, H=64, W=128, lethal=False):
    data = rng.uniform(0, 0.95, (B, H, W)).astype(np.float32)
    if lethal:
        data[:, H // 2, :] = 1.0
    cm = mpc.Costmap(
        data=jnp.asarray(data),
        origin=jnp.tile(jnp.asarray([-1.6, -1.6], jnp.float32), (B, 1)),
        resolution=jnp.full((B,), 0.05, jnp.float32),
    )
    fp1 = mpc.Footprint.rectangle(0.63, 0.41)
    fps = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), fp1)
    poses = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3)), jnp.float32)
    placed = jax.vmap(transform_footprint)(poses, fps)
    return cm, placed


@pytest.mark.parametrize("lethal", [False, True])
def test_matches_gather_path(lethal):
    rng = np.random.default_rng(3 + lethal)
    cm, placed = _batch(rng, lethal=lethal)
    want = jax.vmap(lambda c, f: footprint_cost(c, f, 16))(cm, placed)
    got = footprint_cost_batch_pallas(cm, placed, samples=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_triangle_padding():
    rng = np.random.default_rng(7)
    B = 3
    data = rng.uniform(0, 0.9, (B, 64, 128)).astype(np.float32)
    cm = mpc.Costmap(data=jnp.asarray(data),
                     origin=jnp.tile(jnp.asarray([-1.6, -1.6], jnp.float32), (B, 1)),
                     resolution=jnp.full((B,), 0.05, jnp.float32))
    tri = mpc.Footprint.create([[0.21, 0.11], [-0.19, 0.11], [0.01, -0.16]],
                               max_vertices=8)
    tris = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), tri)
    want = jax.vmap(lambda c, f: footprint_cost(c, f, 16))(cm, tris)
    got = footprint_cost_batch_pallas(cm, tris, samples=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_out_of_bounds_lethal():
    B = 2
    cm = mpc.Costmap(data=jnp.zeros((B, 64, 128), jnp.float32),
                     origin=jnp.tile(jnp.asarray([-1.6, -1.6], jnp.float32), (B, 1)),
                     resolution=jnp.full((B,), 0.05, jnp.float32))
    fp1 = mpc.Footprint.rectangle(0.6, 0.4)
    fps = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), fp1)
    poses = jnp.asarray([[10.0, 10.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    placed = jax.vmap(transform_footprint)(poses, fps)
    got = footprint_cost_batch_pallas(cm, placed, samples=16, interpret=True)
    assert float(got[0]) == 1.0
    assert float(got[1]) == 0.0


class TestQpAdmmKernel:
    """The fused Pallas QP (SPD inverse + unrolled ADMM, sqp._qp_admm_kernel)
    must match the XLA scan path to float-reassociation noise, including on
    padded (non-multiple-of-block) batch tails and warm-started carries."""

    def _inputs(self, rng, B, m=9):
        n = m // 3
        A = rng.normal(size=(B, m, m)).astype(np.float32) * 0.3
        Bmat = A @ np.swapaxes(A, -1, -2) + np.eye(m, dtype=np.float32)
        g = rng.normal(size=(B, m)).astype(np.float32)
        x = rng.uniform(-0.5, 0.5, (B, m)).astype(np.float32)
        xy = x.reshape(B, n, 3)[:, :, :2]
        nrm = np.maximum(np.linalg.norm(xy, axis=-1), 1e-12)
        c = (0.7 - nrm).astype(np.float32)
        J = np.zeros((B, n, m), np.float32)
        for k in range(n):
            J[:, k, 3 * k] = -xy[:, k, 0] / nrm[:, k]
            J[:, k, 3 * k + 1] = -xy[:, k, 1] / nrm[:, k]
        lo = np.full((B, m), -0.7, np.float32)
        hi = np.full((B, m), 0.7, np.float32)
        carry = tuple(rng.normal(size=(B, r)).astype(np.float32) * 0.1
                      for r in (m, m, n, m, n))
        return (jnp.asarray(Bmat.reshape(B, m * m)), jnp.asarray(g),
                jnp.asarray(x), jnp.asarray(c), jnp.asarray(J),
                jnp.asarray(lo), jnp.asarray(hi),
                *(jnp.asarray(a) for a in carry))

    @pytest.mark.parametrize("B", [8, 131])
    @pytest.mark.filterwarnings("ignore")
    def test_matches_plain(self, B):
        from functools import partial

        from neo_mpc_planner2_tpu.sqp import (_qp_admm_pallas_batched,
                                              _qp_admm_plain)

        rng = np.random.default_rng(21 + B)
        args = self._inputs(rng, B)
        kw = dict(iters=6, rho=1.0, sigma=1e-6)
        want = jax.vmap(partial(_qp_admm_plain, **kw))(*args)
        n = 3
        Jm = args[4]
        dxy = jnp.stack([Jm[:, k, 3 * k + a] for k in range(n)
                         for a in (0, 1)], axis=-1)
        got = _qp_admm_pallas_batched(
            *args[:4], dxy, *args[5:], **kw, interpret=True, block=128)
        for w, gt in zip(want, got):
            np.testing.assert_allclose(np.asarray(gt), np.asarray(w),
                                       rtol=2e-4, atol=2e-5)


def test_qp_kernel_dispatch_integration(monkeypatch):
    """Drive the FULL batched SQP solve through the Pallas-QP dispatch rule
    (dxy extraction, broadcasting, scatter of outputs) in interpret mode on
    CPU, and compare against the plain-XLA path. Covers the rule glue that
    otherwise only executes on real TPU."""
    from functools import partial

    from neo_mpc_planner2_tpu import sqp as sqp_mod
    from neo_mpc_planner2_tpu.scenarios import make_scenario_batch

    cfg = mpc.default_config().replace(
        prediction_horizon=0.8, control_steps=3, opt_tolerance=1e-3,
        footprint_edge_samples=8, max_plan_points=16,
        solver_max_iters=3, qp_iters=8,
        w_trans=0.82, w_orient=0.5, w_control=0.05, w_terminal=0.05,
        w_costmap=0.05, w_footprint=2000.0)
    sb = make_scenario_batch(cfg, 8, seed=2, map_size=32, plan_points=12)
    scens = mpc.Scenario.create(
        sb.robot_pose, sb.robot_pose * 0.5, sb.robot_pose + 1.0,
        sb.current_vel, sb.footprint, sb.costmap,
        switch_opt=jnp.zeros(8, bool))
    x0 = jnp.asarray(np.random.default_rng(0).uniform(-0.3, 0.3, (8, 9)),
                     jnp.float32)

    solve = sqp_mod.make_sqp_solver_batched(cfg, mpc.make_objective(cfg))
    want = solve(x0, scens)

    monkeypatch.setattr(sqp_mod, "_KERNEL_MIN_BATCH", 4)
    monkeypatch.setattr(sqp_mod, "_tpu_backend", lambda kill="": True)
    monkeypatch.setattr(
        sqp_mod, "_qp_admm_pallas_batched",
        partial(sqp_mod._qp_admm_pallas_batched, interpret=True, block=128))
    monkeypatch.setattr(
        sqp_mod, "_chol_inverse_pallas_batched",
        partial(sqp_mod._chol_inverse_pallas_batched, interpret=True))
    sqp_mod._qp_admm_core.cache_clear()
    try:
        got = solve(x0, scens)
    finally:
        sqp_mod._qp_admm_core.cache_clear()

    np.testing.assert_allclose(np.asarray(got.x), np.asarray(want.x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.iters),
                                  np.asarray(want.iters))
