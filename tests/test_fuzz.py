"""Randomized-input robustness: no configuration or input in the plausible
envelope may produce NaN commands, constraint violations, or crashes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import neo_mpc_planner2_tpu as mpc


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_engine_fuzz(seed):
    rng = np.random.default_rng(seed)
    cfg = mpc.default_config().replace(
        prediction_horizon=float(rng.uniform(0.3, 1.5)),
        control_steps=int(rng.integers(1, 6)),
        opt_tolerance=float(10 ** rng.uniform(-8, -2)),
        footprint_edge_samples=8,
        max_plan_points=32,
        solver_max_iters=int(rng.integers(5, 40)),
        low_pass_gain=float(rng.uniform(0.05, 1.0)),
        acc_x_limit=float(rng.uniform(0.3, 4.0)),
        acc_y_limit=float(rng.uniform(0.3, 4.0)),
        acc_theta_limit=float(rng.uniform(0.3, 4.0)),
        min_vel_x=float(rng.uniform(-1.0, 0.0)),
        min_vel_y=float(rng.uniform(-1.0, -0.1)),
        min_vel_theta=float(rng.uniform(-1.5, -0.1)),
        max_vel_x=float(rng.uniform(0.2, 1.2)),
        max_vel_y=float(rng.uniform(0.1, 1.2)),
        max_vel_trans=float(rng.uniform(0.2, 1.2)),
        max_vel_theta=float(rng.uniform(0.1, 1.5)),
        w_trans=float(rng.uniform(0, 2)), w_orient=float(rng.uniform(0, 2)),
        w_control=float(rng.uniform(0, 1)), w_terminal=float(rng.uniform(0, 1)),
        w_costmap=float(rng.uniform(0, 2)),
        w_footprint=float(rng.choice([0.0, 100.0, 2000.0])),
        lookahead_dist_min=float(rng.uniform(0.1, 0.6)),
        lookahead_dist_max=float(rng.uniform(0.2, 0.8)),
        lookahead_dist_close_to_goal=float(rng.uniform(0.1, 0.6)),
        # Round-3 line-search knobs in the fuzz envelope.
        solver_max_backtracks=int(rng.choice([7, 10, 16])),
        solver_ls_coarse_after=int(rng.choice([0, 2])),
        solver_ls_coarse_factor=float(rng.choice([0.0625, 0.125, 0.25])),
        solver_ls_warm_alpha=bool(rng.choice([False, True])),
    )
    eng = mpc.MpcEngine(cfg)
    state = eng.init_state()
    data = rng.uniform(0, 1, (40, 40))
    data[rng.integers(0, 40, 15), rng.integers(0, 40, 15)] = 1.0
    cm = mpc.Costmap.create(data, origin=(-1.0, -1.0), resolution=0.05)
    n = int(rng.integers(2, 30))
    plan = mpc.Plan.create(
        np.cumsum(rng.uniform(-0.1, 0.15, (n, 3)) * [1, 1, 0.5], axis=0),
        max_points=cfg.max_plan_points)
    fp = mpc.Footprint.rectangle(float(rng.uniform(0.2, 1.0)),
                                 float(rng.uniform(0.2, 0.8)))
    pose = jnp.asarray(rng.uniform(-0.3, 0.3, 3), jnp.float32)
    vel = jnp.asarray(rng.uniform(-0.5, 0.5, 3), jnp.float32)

    for _ in range(5):
        out = eng.step(state, plan, pose, vel, cm, fp,
                       float(rng.uniform(0.01, 1.0)))
        state = out.state
        cmd = np.asarray(out.cmd_vel)
        assert np.all(np.isfinite(cmd)), (seed, cmd)
        # Either zeroed by a safety stop or inside the feasible set.
        if np.any(cmd != 0.0):
            assert cmd[0] <= cfg.max_vel_x + 1e-4
            assert cmd[0] >= cfg.min_vel_x - 1e-4
            assert abs(cmd[2]) <= max(abs(cfg.min_vel_theta),
                                      cfg.max_vel_theta) + 1e-4
        vel = out.cmd_vel
        pose = mpc.rollout(out.cmd_vel[None, :], jnp.float32(0.033), pose)[0]


@pytest.mark.parametrize("seed", [20, 21])
def test_update_window_fuzz(seed):
    """Randomized update_window geometry (shapes, block sizes, clamped /
    in-range corners, u8 on/off): the one-hot blended write must equal a
    full numpy restage on data AND every cached view, bit-for-bit."""
    rng = np.random.default_rng(seed)
    for _ in range(8):
        H = int(rng.integers(9, 70))
        W = int(rng.integers(9, 70))
        hc = int(rng.integers(1, H + 1))
        wc = int(rng.integers(1, W + 1))
        u8 = bool(rng.integers(0, 2))
        data = rng.uniform(0, 1, (H, W)).astype(np.float32)
        cm = mpc.Costmap.create(data, origin=(-1.0, -1.0),
                                resolution=0.05).with_flat(u8=u8)
        block = rng.uniform(0, 1, (hc, wc)).astype(np.float32)
        # Corner may be negative or push the block past the edge: the write
        # clamps like dynamic_update_slice.
        lo = (int(rng.integers(-3, W + 3)), int(rng.integers(-3, H + 3)))
        out = cm.update_window(jnp.asarray(block), lo)
        col = np.clip(lo[0], 0, W - wc)
        row = np.clip(lo[1], 0, H - hc)
        want = data.copy()
        want[row:row + hc, col:col + wc] = block
        np.testing.assert_array_equal(np.asarray(out.data), want)
        np.testing.assert_array_equal(np.asarray(out.flat), want.reshape(-1))
        if u8:
            want_u8 = np.clip(np.round(want * 255.0), 0, 255).astype(np.uint8)
            np.testing.assert_array_equal(np.asarray(out.flat_u8),
                                          want_u8.reshape(-1))


@pytest.mark.parametrize("seed", [10, 11])
def test_rolling_view_fuzz(seed):
    """Randomized world/window geometry: the zero-copy rolling view must
    sample bit-identically to the materialized slice at arbitrary points —
    in-window, in the out-of-window band, below the origin, off the world —
    for every sampler the engine uses."""
    from neo_mpc_planner2_tpu.ops.costmap import (cost_at_world,
                                                  cost_at_world_bilinear,
                                                  cost_at_world_onehot)
    from neo_mpc_planner2_tpu.ops.footprint import line_cost_exact
    from neo_mpc_planner2_tpu.simulation import rolling_view, rolling_window

    rng = np.random.default_rng(seed)
    for _ in range(6):
        H = int(rng.integers(20, 90))
        W = int(rng.integers(20, 90))
        res = float(rng.choice([0.025, 0.05, 0.1]))
        origin = rng.uniform(-4, 2, 2)
        cells = int(rng.integers(8, min(H, W) + 1))
        world = mpc.Costmap.create(rng.random((H, W)),
                                   origin=tuple(origin),
                                   resolution=res).with_flat()
        span_x = (origin[0] - 2.0, origin[0] + W * res + 2.0)
        span_y = (origin[1] - 2.0, origin[1] + H * res + 2.0)
        pose = jnp.asarray([rng.uniform(*span_x), rng.uniform(*span_y), 0.0],
                           jnp.float32)
        win = rolling_window(world, pose, cells)
        view = rolling_view(world, pose, cells)
        wx = jnp.asarray(rng.uniform(*span_x, 128), jnp.float32)
        wy = jnp.asarray(rng.uniform(*span_y, 128), jnp.float32)
        for fn in (cost_at_world, cost_at_world_onehot,
                   cost_at_world_bilinear):
            np.testing.assert_array_equal(
                np.asarray(fn(view, wx, wy)), np.asarray(fn(win, wx, wy)),
                err_msg=f"{fn.__name__} H={H} W={W} cells={cells}")
        np.testing.assert_array_equal(
            np.asarray(line_cost_exact(view, wx[:16], wy[:16],
                                       wx[16:32], wy[16:32])),
            np.asarray(line_cost_exact(win, wx[:16], wy[:16],
                                       wx[16:32], wy[16:32])),
            err_msg=f"line_cost_exact H={H} W={W} cells={cells}")


# ---- round-4 fuzz widening (VERDICT item 8): CompatConfig combinations,
# degenerate footprints, plan-length boundaries, resolution guards, and the
# NaN/Inf input policy (serving rejects at the wire boundary; the library is
# GIGO-but-never-crashes).

def _tick_once(cfg, fp, pose=None):
    eng = mpc.MpcEngine(cfg)
    cm = mpc.Costmap.create(np.zeros((40, 40)), origin=(-1.0, -1.0),
                            resolution=0.05)
    plan = mpc.Plan.create([[0, 0, 0], [0.4, 0.05, 0.1], [0.8, 0.1, 0.2]],
                           max_points=cfg.max_plan_points)
    pose = jnp.asarray([0.0, 0.0, 0.0] if pose is None else pose, jnp.float32)
    return eng.step(eng.init_state(), plan, pose,
                    jnp.asarray([0.2, 0.0, 0.0]), cm, fp, 1 / 30)


@pytest.mark.parametrize("seed", [10, 11, 12, 13])
def test_compat_flag_combinations(seed):
    """Random CompatConfig subsets: every combination must produce finite,
    bounds-respecting commands through the full tick."""
    import dataclasses
    rng = np.random.default_rng(seed)
    base = mpc.default_config().replace(
        max_plan_points=16, w_trans=0.82, w_orient=0.5, w_control=0.05,
        w_terminal=0.05, w_costmap=0.5, w_footprint=100.0,
        min_vel_x=-0.7, min_vel_y=-0.7, min_vel_theta=-0.7,
        max_vel_x=0.7, max_vel_y=0.7, max_vel_trans=0.7, max_vel_theta=0.7)
    flags = {f.name: bool(rng.integers(0, 2))
             for f in dataclasses.fields(type(base.compat))}
    cfg = base.replace(compat=dataclasses.replace(base.compat, **flags))
    out = _tick_once(cfg, mpc.Footprint.rectangle(0.6, 0.4))
    cmd = np.asarray(out.cmd_vel)
    assert np.all(np.isfinite(cmd)), (flags, cmd)
    assert np.linalg.norm(cmd[:2]) <= cfg.max_vel_trans + 1e-5, (flags, cmd)
    assert abs(cmd[2]) <= cfg.max_vel_theta + 1e-5, (flags, cmd)


@pytest.mark.parametrize("verts", [
    [[0.3, 0.0], [0.0, 0.0], [-0.3, 0.0]],          # collinear (zero area)
    [[0.3, 0.2], [0.3, 0.2], [-0.3, -0.2], [-0.3, -0.2]],  # duplicates
    [[0.2, 0.1], [-0.2, 0.1]],                       # 2-vertex "polygon"
    [[0.15, 0.05]],                                  # single vertex
])
def test_degenerate_footprints(verts):
    """Collinear/duplicate/underfilled polygons (zero-length edges) must not
    crash or emit non-finite costs anywhere in the tick."""
    cfg = mpc.default_config().replace(max_plan_points=16, w_footprint=100.0,
                                       w_trans=0.82, w_control=0.05)
    fp = mpc.Footprint.create(verts, max_vertices=8)
    out = _tick_once(cfg, fp)
    assert np.all(np.isfinite(np.asarray(out.cmd_vel)))
    # The exact edge walk handles zero-length edges too.
    cfg_exact = cfg.replace(footprint_exact=True)
    out = _tick_once(cfg_exact, fp)
    assert np.all(np.isfinite(np.asarray(out.cmd_vel)))


def test_plan_length_boundaries():
    cfg = mpc.default_config().replace(max_plan_points=8)
    pts = np.cumsum(np.full((8, 3), 0.05), axis=0)
    plan = mpc.Plan.create(pts, max_points=8)    # exactly max: fine
    assert int(plan.n_valid) == 8
    with pytest.raises(ValueError, match="> max"):
        mpc.Plan.create(np.zeros((9, 3)), max_points=8)
    with pytest.raises(ValueError, match="zero length"):
        mpc.Plan.create(np.zeros((0, 3)), max_points=8)


def test_costmap_resolution_guard():
    for bad in (0.0, -0.05):
        with pytest.raises(ValueError, match="resolution"):
            mpc.Costmap.create(np.zeros((4, 4)), resolution=bad)


def test_serving_rejects_nonfinite_and_bad_geometry():
    """Wire-boundary NaN/Inf policy: reject explicitly (a non-finite cell or
    pose would silently poison the persistent warm-start state)."""
    from neo_mpc_planner2_tpu.serving import OptimizerSession
    s = OptimizerSession(mpc.default_config())
    bad_map = np.zeros((8, 8)); bad_map[2, 2] = np.nan
    assert "error" in s.handle({"op": "set_costmap",
                                "data": bad_map.tolist()})
    assert "error" in s.handle({"op": "set_costmap",
                                "data": np.zeros((8, 8)).tolist(),
                                "resolution": 0.0})
    assert "error" in s.handle({"op": "set_footprint",
                                "points": [[np.inf, 0.0], [0, 0], [1, 1]]})
    # Stage valid geometry, then a NaN pose in the hot op.
    s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
              "origin": [-1, -1], "resolution": 0.05})
    s.handle({"op": "set_footprint",
              "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
    r = s.handle({"op": "optimizer", "current_pose": [np.nan, 0, 0],
                  "carrot_pose": [0.4, 0, 0], "goal_pose": [1, 0, 0],
                  "current_vel": [0, 0, 0], "delta_t": 0.033})
    assert "error" in r
    # The rejected request must not have corrupted the slot: a clean request
    # right after still succeeds.
    ok = s.handle({"op": "optimizer", "current_pose": [0, 0, 0],
                   "carrot_pose": [0.4, 0, 0], "goal_pose": [1, 0, 0],
                   "current_vel": [0.2, 0, 0], "delta_t": 0.033})
    assert "output_vel" in ok
    assert np.all(np.isfinite(ok["output_vel"]))


def test_library_nan_input_does_not_crash():
    """Library-level policy (documented): NaN inputs are GIGO — the tick must
    never raise or hang; outputs may be NaN/garbage, caller's contract."""
    cfg = mpc.default_config().replace(max_plan_points=16)
    out = _tick_once(cfg, mpc.Footprint.rectangle(0.6, 0.4),
                     pose=[np.nan, 0.0, 0.0])
    assert np.asarray(out.cmd_vel).shape == (3,)


@pytest.mark.parametrize("seed", [20, 21])
def test_random_plan_lengths_through_serving(seed):
    """set_plan/tick across the full legal plan-length envelope [1, max]."""
    from neo_mpc_planner2_tpu.serving import OptimizerSession
    rng = np.random.default_rng(seed)
    cfg = mpc.default_config().replace(
        max_plan_points=32, w_trans=0.82, w_control=0.05)
    s = OptimizerSession(cfg)
    s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
              "origin": [-1, -1], "resolution": 0.05})
    s.handle({"op": "set_footprint",
              "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
    for n in [1, int(rng.integers(2, 31)), 32]:
        poses = np.cumsum(rng.uniform(0, 0.08, (n, 3)), axis=0)
        assert s.handle({"op": "set_plan", "poses": poses.tolist()})["ok"]
        r = s.handle({"op": "tick", "pose": [0, 0, 0], "vel": [0, 0, 0],
                      "delta_t": 0.033})
        assert "output_vel" in r and np.all(np.isfinite(r["output_vel"]))
    assert "error" in s.handle({"op": "set_plan",
                                "poses": np.zeros((33, 3)).tolist()})


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_product_patch_sampler_fuzz(seed):
    """Property: for random maps/centers/halfwidths, the patch samplers are
    BIT-identical to the full-map samplers at every point whose bilinear
    neighborhood lies within the coverage guarantee, and conservative
    (>= full-map value... specifically lethal) outside it."""
    from neo_mpc_planner2_tpu.ops.costmap import (
        ProductPatchSampler, cost_at_world, cost_at_world_bilinear)

    rng = np.random.default_rng(100 + seed)
    H = int(rng.integers(24, 96))
    W = int(rng.integers(24, 96))
    res = float(rng.uniform(0.03, 0.1))
    ox, oy = float(rng.uniform(-2, 0)), float(rng.uniform(-2, 0))
    data = rng.uniform(0, 1, (H, W)).astype(np.float32)
    cm = mpc.Costmap.create(data, origin=(ox, oy), resolution=res)
    h = int(rng.integers(6, 20))
    cx = float(rng.uniform(ox - 0.3, ox + W * res + 0.3))
    cy = float(rng.uniform(oy - 0.3, oy + H * res + 0.3))
    s = ProductPatchSampler(cm, jnp.float32(cx), jnp.float32(cy), h)

    # Points within (h-2) cells of the center: inside coverage with the
    # bilinear +1 neighbor to spare.
    r = (h - 2) * res
    wx = jnp.asarray(rng.uniform(cx - r, cx + r, 128), jnp.float32)
    wy = jnp.asarray(rng.uniform(cy - r, cy + r, 128), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(s.bilinear(wx, wy)),
        np.asarray(cost_at_world_bilinear(cm, wx, wy)))
    np.testing.assert_array_equal(
        np.asarray(s.nearest(wx, wy)),
        np.asarray(cost_at_world(cm, wx, wy)))

    # Far outside the patch: lethal (conservative), never un-lethal.
    fx = jnp.asarray(cx + (h + 10) * res + rng.uniform(0, 1, 16),
                     jnp.float32)
    fy = jnp.asarray(np.full(16, cy), jnp.float32)
    assert np.all(np.asarray(s.nearest(fx, fy)) == 1.0)
