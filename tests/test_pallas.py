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
