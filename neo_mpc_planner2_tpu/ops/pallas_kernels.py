"""Pallas TPU kernels for the hot ops.

`footprint_cost_batch_pallas`: the batched footprint-boundary max-cost — the
most frequently evaluated op in the engine (pursuit gate, solver footprint
term, post-solve collision check, SURVEY.md §2.2 FootprintCollisionChecker
row) — as one fused kernel. Per grid step (= one scenario):

  1. the (H, W) costmap block and the (V, 2) placed polygon land in VMEM;
  2. edge sample points are generated in-kernel ((V, S) positions along each
     edge, including the closing edge);
  3. the nearest-cell lookup runs as one-hot MXU contractions — TPU has no
     vector gather, so sampling is  rows(S,H) @ map(H,W) → (S,W), masked by
     col one-hots and max-reduced — with out-of-bounds forced lethal;
  4. one scalar per scenario comes back.

Everything between HBM loads and the scalar store stays in VMEM/registers, so
nothing round-trips through HBM the way the unfused one-hot path's (S, H)/(S, W)
intermediates do. Requires map dims padded to the (8, 128) float32 tile.

Measured on TPU v5e at (1024, 48, 128), 16 samples: pallas 2.7 ms vs 3.7 ms
(XLA gather path) and 2.0 ms (XLA one-hot path). Bit-exact against the gather
path in interpret mode (tests); on real TPU, samples landing exactly on cell
boundaries may pick the adjacent cell relative to the other paths because
--xla_allow_excess_precision lets the compiler rewrite the world→cell division
differently per fusion (the XLA gather and one-hot paths differ from each
other there too). Kept as an optional path; the default stays XLA one-hot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .costmap import Costmap, LETHAL_COST
from .footprint import Footprint

__all__ = ["footprint_cost_batch_pallas"]


def _kernel(data_ref, origin_ref, res_ref, verts_ref, nvalid_ref, out_ref,
            *, samples: int, height: int, width: int):
    data = data_ref[0]                        # (H, W) costmap, VMEM
    origin_x = origin_ref[0, 0, 0]
    origin_y = origin_ref[0, 0, 1]
    inv_res = 1.0 / res_ref[0, 0, 0]          # SMEM scalar
    verts = verts_ref[0]                      # (V, 2) placed polygon, VMEM
    n_valid = nvalid_ref[0, 0, 0]             # SMEM scalar

    V = verts.shape[0]
    # Edge i runs vertex i -> vertex (i+1) mod n_valid (closing edge included).
    idx = jax.lax.broadcasted_iota(jnp.int32, (V, 1), 0)[:, 0]
    nxt = jnp.where(idx + 1 >= n_valid, 0, idx + 1)
    nxt_onehot = (nxt[:, None] == idx[None, :]).astype(data.dtype)   # (V, V)
    ends = jnp.dot(nxt_onehot, verts, preferred_element_type=jnp.float32)
    starts = verts

    t = (jax.lax.broadcasted_iota(jnp.int32, (1, samples), 1)
         .astype(jnp.float32) / (samples - 1))                       # (1, S)
    px = starts[:, 0:1] + (ends[:, 0:1] - starts[:, 0:1]) * t        # (V, S)
    py = starts[:, 1:2] + (ends[:, 1:2] - starts[:, 1:2]) * t        # (V, S)

    # World -> integer cells (truncation toward zero like the gather path;
    # coordinates here are positive-offset so floor == trunc).
    mx = ((px - origin_x) * inv_res).astype(jnp.int32)               # (V, S)
    my = ((py - origin_y) * inv_res).astype(jnp.int32)
    # Bool minor-dim inserts are unsupported in Mosaic; keep the mask f32.
    in_b = ((mx >= 0) & (mx < width) & (my >= 0) & (my < height)
            ).astype(jnp.float32)                                    # (V, S)
    mxc = jnp.clip(mx, 0, width - 1)
    myc = jnp.clip(my, 0, height - 1)

    # One-hot sampling on the MXU, one edge (row of S samples) at a time —
    # Mosaic supports only 2-D shapes here, so the (V, S) grid is unrolled
    # over its (static, tiny) V axis instead of flattened.
    best = jnp.full((1, samples), -jnp.inf, jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (samples, height), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (samples, width), 1)
    for v in range(V):
        rows = (myc[v, :][:, None] == row_ids).astype(data.dtype)    # (S, H)
        cols = (mxc[v, :][:, None] == col_ids).astype(data.dtype)    # (S, W)
        gathered = jnp.dot(rows, data, preferred_element_type=jnp.float32)
        vals = jnp.sum(gathered * cols, axis=-1, keepdims=True)      # (S, 1)
        m = in_b[v, :][:, None]
        vals = vals * m + LETHAL_COST * (1.0 - m)
        # Exclude padded edges (v >= n_valid) from the max.
        vals = jnp.where(v < n_valid, vals, -jnp.inf)
        best = jnp.maximum(best, vals.reshape(1, samples))

    # Mosaic cannot store scalars to VMEM and SMEM outputs must still obey
    # the (8, 128) tile rule, so the scalar is broadcast into one padded
    # VMEM tile; the host wrapper slices [0, 0] back out.
    out_ref[0] = jnp.full((8, 128), jnp.max(best), jnp.float32)


@functools.partial(jax.jit, static_argnames=("samples", "interpret"))
def footprint_cost_batch_pallas(cm: Costmap, fp: Footprint,
                                samples: int = 16,
                                interpret: bool = False) -> jnp.ndarray:
    """Batched boundary max-cost: cm.data (B, H, W), fp.vertices (B, V, 2)
    already placed in world coordinates. Returns (B,) float32.

    Equivalent to vmap(footprint_cost) with nearest-cell sampling; fused into
    one Pallas kernel with a grid over the batch.
    """
    B, H, W = cm.data.shape
    V = fp.vertices.shape[1]

    origin = cm.origin.reshape(B, 1, 2)
    res = cm.resolution.reshape(B, 1, 1)
    nv = fp.n_valid.reshape(B, 1, 1).astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, samples=samples, height=H, width=W),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, V, 2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cm.data, origin, res, fp.vertices, nv)
    return out[:, 0, 0]
