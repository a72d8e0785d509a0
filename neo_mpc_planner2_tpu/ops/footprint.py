"""Footprint polygon collision cost on device.

TPU-native replacement for two reference pieces:

- nav2 `FootprintCollisionChecker::footprintCostAtPose` called from the C++
  plugin on the raw 0-255 scale (NeoMpcPlanner.cpp:218-219, :332-333);
- `Costmap2d.getFootprintCost(Polygon)` on the normalized [0,1] scale called
  from the Python server (mpc_optimization_server.py:262, :343), whose
  `LineIterator` walks each polygon edge and takes the max cell cost.

Instead of a sequential Bresenham walk per edge (data-dependent trip counts —
hostile to XLA), every edge is sampled at `samples` equally spaced points
(static shape), all points are gathered from the costmap in one vectorized
lookup, and the max is reduced. With `samples` chosen so the sample spacing is
below the map resolution this visits a superset of the Bresenham cells' centers
and yields the same max on the maps used here; the oracle uses the identical
sampling so parity tests are exact by construction.

The polygon is padded to a static vertex count with an explicit valid count so
footprints of different robots batch together.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from .costmap import Costmap, cost_at_world, cost_at_world_onehot
from .se2 import se2_apply

__all__ = ["Footprint", "transform_footprint", "footprint_cost", "footprint_cost_at_pose"]


@flax.struct.dataclass
class Footprint:
    """Padded polygon. vertices: (V, 2); n_valid: () int32 (<= V)."""

    vertices: jnp.ndarray
    n_valid: jnp.ndarray

    @staticmethod
    def create(points, max_vertices: int = 8) -> "Footprint":
        pts = jnp.asarray(points, jnp.float32)
        n = pts.shape[0]
        if n > max_vertices:
            raise ValueError(f"footprint has {n} vertices > max {max_vertices}")
        pad = jnp.zeros((max_vertices - n, 2), jnp.float32) + pts[-1]
        return Footprint(
            vertices=jnp.concatenate([pts, pad], axis=0),
            n_valid=jnp.asarray(n, jnp.int32),
        )

    @staticmethod
    def rectangle(length: float, width: float, max_vertices: int = 8) -> "Footprint":
        """Axis-aligned rectangle centered on base_link (MPO-700-style box)."""
        hl, hw = length / 2.0, width / 2.0
        return Footprint.create(
            [[hl, hw], [-hl, hw], [-hl, -hw], [hl, -hw]], max_vertices
        )


def transform_footprint(pose: jnp.ndarray, fp: Footprint) -> Footprint:
    """Rigidly place the footprint at pose [x, y, yaw].

    Product-mode equivalent of the intended (but aliased-away, SURVEY.md §2.3 /
    config.CompatConfig.footprint_alias_noop) vertex rotation at
    mpc_optimization_server.py:238-244.
    """
    return fp.replace(vertices=se2_apply(pose, fp.vertices))


def footprint_cost(cm: Costmap, fp: Footprint, samples: int = 32,
                   mode: str = "gather") -> jnp.ndarray:
    """Max costmap cost along the polygon boundary (normalized scale, 1.0 =
    collision) — Costmap2d.getFootprintCost equivalent.

    Edges run i -> (i+1) mod n_valid, including the closing edge, matching the
    nav2 footprint checker's edge iteration. Padded vertices are excluded via
    the valid mask.
    """
    V = fp.vertices.shape[0]
    idx = jnp.arange(V)
    nxt = jnp.mod(idx + 1, fp.n_valid)
    starts = fp.vertices                      # (V, 2)
    ends = fp.vertices[nxt]                   # (V, 2)

    t = jnp.linspace(0.0, 1.0, samples)       # (S,)
    pts = starts[:, None, :] + (ends - starts)[:, None, :] * t[None, :, None]  # (V, S, 2)
    sample = cost_at_world_onehot if mode == "onehot" else cost_at_world
    costs = sample(cm, pts[..., 0], pts[..., 1])  # (V, S)

    edge_valid = idx < fp.n_valid             # (V,)
    costs = jnp.where(edge_valid[:, None], costs, -jnp.inf)
    return jnp.max(costs)


def footprint_cost_at_pose(
    cm: Costmap, fp: Footprint, pose: jnp.ndarray, samples: int = 32,
    mode: str = "gather",
) -> jnp.ndarray:
    """footprintCostAtPose equivalent (NeoMpcPlanner.cpp:218-219): place the
    base-frame footprint at pose and return the boundary max cost (normalized;
    multiply by 255 for the raw nav2 scale used by the plugin's thresholds)."""
    return footprint_cost(cm, transform_footprint(pose, fp), samples, mode)
