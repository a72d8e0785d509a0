"""Serving-layer tests: the OptimizerSession request handler (in-process) and
the TCP wire protocol (real socket server in a thread)."""

import threading

import numpy as np
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.serving import OptimizerClient, OptimizerSession, serve


@pytest.fixture(scope="module")
def session(cfg):
    s = OptimizerSession(cfg)
    s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
              "origin": [-1, -1], "resolution": 0.05})
    s.handle({"op": "set_footprint",
              "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
    return s


def _opt_req(**kw):
    req = {"op": "optimizer", "current_pose": [0, 0, 0],
           "carrot_pose": [0.4, 0.1, 0.2], "goal_pose": [1.0, 0.5, 0.3],
           "current_vel": [0.3, 0, 0], "control_interval": 0.033,
           "delta_t": 0.033}
    req.update(kw)
    return req


class TestSession:
    def test_ping(self, session):
        r = session.handle({"op": "ping"})
        assert r["ok"] and r["backend"] == "cpu"

    def test_optimizer_requires_costmap(self, cfg):
        s = OptimizerSession(cfg)
        assert "error" in s.handle(_opt_req())

    def test_optimizer_roundtrip(self, session):
        r = session.handle(_opt_req())
        assert "output_vel" in r and len(r["output_vel"]) == 3
        assert r["success"] in (True, False)
        assert len(r["local_plan"]) == session.cfg.control_steps + 1
        # Acceleration clamp from zero last_control.
        lim = session.cfg.acc_x_limit * 0.033
        assert abs(r["output_vel"][0]) <= lim + 1e-5

    def test_state_persists_between_calls(self, session):
        r1 = session.handle(_opt_req())
        r2 = session.handle(_opt_req())
        # Warm start + accel ramp: second command moves further.
        assert abs(r2["output_vel"][0]) >= abs(r1["output_vel"][0]) - 1e-6

    def test_reset(self, session):
        session.handle(_opt_req())
        r = session.handle({"op": "reset"})
        assert r["ok"]
        assert float(np.abs(np.asarray(session.state.initial_guess)).sum()) == 0.0

    def test_unknown_op(self, session):
        assert "error" in session.handle({"op": "nope"})

    def test_malformed_request(self, session):
        assert "error" in session.handle({"op": "optimizer", "current_pose": [0]})


class TestWireProtocol:
    def test_tcp_roundtrip(self, cfg):
        ready = threading.Event()
        t = threading.Thread(target=serve,
                             args=("127.0.0.1", 7981, cfg, ready), daemon=True)
        t.start()
        assert ready.wait(10)
        c = OptimizerClient(port=7981, wait_timeout=10)
        assert c.call({"op": "ping"})["ok"]
        c.call({"op": "set_costmap", "data": np.zeros((20, 20)).tolist(),
                "origin": [-0.5, -0.5], "resolution": 0.05})
        c.call({"op": "set_footprint",
                "points": [[0.1, 0.1], [-0.1, 0.1], [-0.1, -0.1], [0.1, -0.1]]})
        r = c.call(_opt_req())
        assert "output_vel" in r
        c.close()


class TestPipelinedMode:
    def test_advanced_step_returns_previous(self, cfg):
        s = OptimizerSession(cfg, pipelined=True)
        s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                  "origin": [-1, -1], "resolution": 0.05})
        s.handle({"op": "set_footprint",
                  "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
        r1 = s.handle(_opt_req())
        assert r1.get("pipelined_warmup") and r1["output_vel"] == [0, 0, 0]
        r2 = s.handle(_opt_req())
        # Second reply carries the FIRST tick's solve.
        assert "pipelined_warmup" not in r2
        assert abs(r2["output_vel"][0]) > 0
        # Matches what a non-pipelined session produces on its first tick.
        s2 = OptimizerSession(cfg)
        s2.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                   "origin": [-1, -1], "resolution": 0.05})
        s2.handle({"op": "set_footprint",
                   "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
        r_direct = s2.handle(_opt_req())
        np.testing.assert_allclose(r2["output_vel"], r_direct["output_vel"],
                                   atol=1e-6)

    def test_pipelined_toggle_clears_pending(self, cfg):
        """Toggling pipelined off then on must NOT serve a pre-toggle
        command as 'the previous tick' (round-3 review finding)."""
        s = OptimizerSession(cfg, pipelined=True)
        s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                  "origin": [-1, -1], "resolution": 0.05})
        s.handle({"op": "set_footprint",
                  "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                             [0.3, -0.2]]})
        s.handle(_opt_req())
        s.handle(_opt_req())          # pending now holds tick-2's result
        s.handle({"op": "configure", "pipelined": False})
        for _ in range(3):
            s.handle(_opt_req(goal_pose=[0.2, -0.5, 0.0]))
        s.handle({"op": "configure", "pipelined": True})
        r = s.handle(_opt_req(goal_pose=[0.2, -0.5, 0.0]))
        # First pipelined tick after the toggle is a warmup, not tick-2's
        # stale command toward the old goal.
        assert r.get("pipelined_warmup")

    def test_reset_clears_pending(self, cfg):
        s = OptimizerSession(cfg, pipelined=True)
        s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                  "origin": [-1, -1], "resolution": 0.05})
        s.handle({"op": "set_footprint",
                  "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
        s.handle(_opt_req())
        s.handle({"op": "reset"})
        r = s.handle(_opt_req())
        assert r.get("pipelined_warmup")


def test_reconfigure_preserves_mission_state(cfg):
    """cb_params parity (py:405-439): runtime weight updates must not reset
    the warm start / timers; only a control_steps resize may."""
    s = OptimizerSession(cfg)
    s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
              "origin": [-1, -1], "resolution": 0.05})
    s.handle({"op": "set_footprint",
              "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
    s.handle(_opt_req())
    guess_before = np.asarray(s.state.initial_guess).copy()
    assert np.abs(guess_before).sum() > 0
    import dataclasses
    params = {f.name: getattr(cfg, f.name)
              for f in dataclasses.fields(type(cfg)) if f.name != "compat"}
    params["w_trans"] = 0.3
    s.handle({"op": "configure", "params": params})
    np.testing.assert_array_equal(np.asarray(s.state.initial_guess), guess_before)
    # control_steps resize does reset.
    params["control_steps"] = 5
    s.handle({"op": "configure", "params": params})
    assert s.state.initial_guess.shape[0] == 15
    assert float(np.abs(np.asarray(s.state.initial_guess)).sum()) == 0.0


def test_partial_reconfigure_merges(cfg):
    """A reconfigure naming only some parameters must keep the rest at their
    current values (cb_params updates only the named ones, py:405-439), not
    silently reset them to defaults (ADVICE round-1)."""
    s = OptimizerSession(cfg.replace(w_trans=0.9, max_vel_x=0.6))
    s.handle({"op": "configure", "params": {"max_vel_x": 0.3}})
    assert s.cfg.max_vel_x == 0.3
    assert s.cfg.w_trans == 0.9          # untouched by the partial update
    assert s.cfg.control_steps == cfg.control_steps


def test_configure_u8_toggle_restages_costmap(cfg):
    """Toggling solver_costmap_u8 at runtime must re-derive the staged
    gather caches: make_point_sampler prefers a cached u8 buffer whenever
    one is present, so a stale cache silently pins the old sampling source
    until the next full set_costmap (round-5 review)."""
    s = OptimizerSession(cfg)
    s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
              "origin": [-1, -1], "resolution": 0.05})
    assert s.costmap.flat_u8 is None          # default: f32 source
    s.handle({"op": "configure", "params": {"solver_costmap_u8": True}})
    assert s.costmap.flat_u8 is not None      # toggle ON takes effect
    s.handle({"op": "configure", "params": {"solver_costmap_u8": False}})
    assert s.costmap.flat_u8 is None          # toggle OFF drops the cache


class TestFleetBatch:
    """op_optimizer_batch: N robots sharing the staged costmap/footprint
    solved as one batched device dispatch with persistent per-lane state."""

    def _robot(self, i):
        return {"current_pose": [0.05 * i, 0, 0],
                "carrot_pose": [0.4, 0.1 - 0.05 * i, 0.2],
                "goal_pose": [1.0, 0.5, 0.3],
                "current_vel": [0.3, 0, 0],
                "control_interval": 0.033}

    def test_matches_single_robot_sessions(self, cfg):
        """Every fleet lane must produce what a dedicated single-robot session
        produces for the same request stream (vmap-vs-unbatched float fusion
        may reassociate; commands agree to 1e-5)."""
        stage = [
            {"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
             "origin": [-1, -1], "resolution": 0.05},
            {"op": "set_footprint",
             "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]},
        ]
        fleet = OptimizerSession(cfg)
        for m in stage:
            fleet.handle(m)
        singles = []
        for i in range(3):
            s = OptimizerSession(cfg)
            for m in stage:
                s.handle(m)
            singles.append(s)
        for tick in range(3):
            r = fleet.handle({"op": "optimizer_batch", "delta_t": 0.033,
                              "robots": [self._robot(i) for i in range(3)]})
            assert len(r["results"]) == 3
            for i, s in enumerate(singles):
                req = dict(self._robot(i))
                req.update({"op": "optimizer", "delta_t": 0.033})
                ri = s.handle(req)
                np.testing.assert_allclose(
                    r["results"][i]["output_vel"], ri["output_vel"],
                    atol=1e-5)
                assert r["results"][i]["collision"] == ri["collision"]

    def test_pipelined_churn_across_pad_boundary(self, cfg):
        """Per-tick fleet-size churn that crosses a pad boundary (4<->5
        robots: pad 4<->8, so _resize_fleet runs every tick) must still
        serve SURVIVING lanes the previous tick's real results — clearing
        the pending on resize made pipelined mode return all-warmup zero
        commands forever (round-5 review)."""
        fleet = OptimizerSession(cfg, pipelined=True)
        fleet.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                      "origin": [-1, -1], "resolution": 0.05})
        fleet.handle({"op": "set_footprint",
                      "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                                 [0.3, -0.2]]})
        sizes = [5, 4, 5, 4, 5]
        real = 0
        for t, nsz in enumerate(sizes):
            r = fleet.handle({"op": "optimizer_batch", "delta_t": 0.033,
                              "robots": [self._robot(i) for i in range(nsz)]})
            if t > 0:
                # Lanes 0..min(prev,n)-1 survived: their results must be the
                # previous tick's REAL commands, not warmup zeros.
                surv = min(nsz, sizes[t - 1])
                real += sum(not r["results"][i].get("pipelined_warmup", False)
                            for i in range(surv))
        assert real > 0  # the old behavior had real == 0 (all warmup, always)

    def test_fleet_clock_not_advanced_by_rejected_request(self, cfg):
        """A malformed robot rejects the whole batch WITHOUT advancing the
        stuck-timer clock or lane state (validate-before-mutate)."""
        fleet = OptimizerSession(cfg)
        fleet.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                      "origin": [-1, -1], "resolution": 0.05})
        fleet.handle({"op": "set_footprint",
                      "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                                 [0.3, -0.2]]})
        fleet.handle({"op": "optimizer_batch", "delta_t": 0.033,
                      "robots": [self._robot(0)]})
        clock = fleet._fleet_last_time
        bad = dict(self._robot(1))
        bad["current_pose"] = [float("nan"), 0, 0]
        r = fleet.handle({"op": "optimizer_batch",
                          "robots": [self._robot(0), bad]})
        assert "error" in r
        assert fleet._fleet_last_time == clock
        assert fleet._fleet_n == 1  # grown-lane reset never ran

    def test_chunked_dispatch_matches_single_dispatch(self, cfg):
        """fleet_chunk splits an oversized padded fleet into sequential
        equal-chunk dispatches sharing one executable (+4-8 % measured at
        >=8192 lanes, PERF.md round 11c). Lanes are independent, so every
        per-lane result and the persistent lane state must match the
        single-dispatch session (16 lanes / chunk 8 here: two dispatches,
        each still tiling the 8-device test mesh)."""
        stage = [
            {"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
             "origin": [-1, -1], "resolution": 0.05},
            {"op": "set_footprint",
             "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]},
        ]
        one = OptimizerSession(cfg, fleet_chunk=0)
        chunked = OptimizerSession(cfg, fleet_chunk=8)
        for m in stage:
            one.handle(m)
            chunked.handle(m)
        robots = [self._robot(i) for i in range(16)]
        for tick in range(3):
            r1 = one.handle({"op": "optimizer_batch", "delta_t": 0.033,
                             "robots": robots})
            r2 = chunked.handle({"op": "optimizer_batch", "delta_t": 0.033,
                                 "robots": robots})
            for a, b in zip(r1["results"], r2["results"]):
                np.testing.assert_allclose(a["output_vel"], b["output_vel"],
                                           atol=1e-5)
                assert a["collision"] == b["collision"]
        np.testing.assert_allclose(
            np.asarray(one._fleet_state.initial_guess),
            np.asarray(chunked._fleet_state.initial_guess), atol=1e-5)
        # A misaligned chunk (not dividing the pad) falls back to one
        # dispatch rather than mis-tiling.
        odd = OptimizerSession(cfg, fleet_chunk=3)
        for m in stage:
            odd.handle(m)
        r3 = odd.handle({"op": "optimizer_batch", "delta_t": 0.033,
                         "robots": robots[:5]})
        assert len(r3["results"]) == 5

    def test_resize_preserves_existing_lanes(self, cfg):
        fleet = OptimizerSession(cfg)
        fleet.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                      "origin": [-1, -1], "resolution": 0.05})
        fleet.handle({"op": "set_footprint",
                      "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                                 [0.3, -0.2]]})
        fleet.handle({"op": "optimizer_batch", "delta_t": 0.033,
                      "robots": [self._robot(i) for i in range(3)]})
        warm = np.asarray(fleet._fleet_state.initial_guess)[:3].copy()
        assert np.abs(warm).sum() > 0
        # Grow 3 -> 5: lanes 0-2 keep their warm starts, 3-4 start cold.
        r = fleet.handle({"op": "optimizer_batch", "delta_t": 0.033,
                          "robots": [self._robot(i) for i in range(5)]})
        assert len(r["results"]) == 5
        # Lane 3/4 first command is accel-clamped from zero last_control.
        lim = cfg.acc_x_limit * 0.033
        assert abs(r["results"][3]["output_vel"][0]) <= lim + 1e-5
        # A continuing lane is not re-clamped to the first-tick ramp (its
        # last_control is nonzero), so it moves past the fresh lanes.
        assert (abs(r["results"][0]["output_vel"][0])
                > abs(r["results"][3]["output_vel"][0]) - 1e-6)

    def _staged(self, cfg, pipelined=False):
        s = OptimizerSession(cfg, pipelined=pipelined)
        s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                  "origin": [-1, -1], "resolution": 0.05})
        s.handle({"op": "set_footprint",
                  "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                             [0.3, -0.2]]})
        return s

    def test_pad_lane_state_not_inherited(self, cfg):
        """A robot joining within the existing pad must start from
        init_state, not the evolved state of the pad lane that was being
        solved every tick (ADVICE round-2 medium)."""
        fleet = self._staged(cfg)
        # 3 robots => pad 4; lane 3 is a pad lane that evolves every tick.
        for _ in range(4):
            fleet.handle({"op": "optimizer_batch", "delta_t": 0.033,
                          "robots": [self._robot(i) for i in range(3)]})
        # Pad lane 3 has accumulated state by now (it solves the zero
        # scenario each tick); a fresh 4th robot must not see any of it.
        r = fleet.handle({"op": "optimizer_batch", "delta_t": 0.033,
                          "robots": [self._robot(i) for i in range(4)]})
        single = self._staged(cfg)
        req = dict(self._robot(3))
        req.update({"op": "optimizer", "delta_t": 0.033})
        r_single = single.handle(req)
        np.testing.assert_allclose(r["results"][3]["output_vel"],
                                   r_single["output_vel"], atol=1e-5)

    def test_shrink_then_grow_resets_dropped_lanes(self, cfg):
        """Lanes dropped by a shrink must come back as FRESH robots on the
        next grow (positional identity does not survive a drop)."""
        fleet = self._staged(cfg)
        for _ in range(3):
            fleet.handle({"op": "optimizer_batch", "delta_t": 0.033,
                          "robots": [self._robot(i) for i in range(4)]})
        fleet.handle({"op": "optimizer_batch", "delta_t": 0.033,
                      "robots": [self._robot(i) for i in range(2)]})
        r = fleet.handle({"op": "optimizer_batch", "delta_t": 0.033,
                          "robots": [self._robot(i) for i in range(4)]})
        # Lane 3's first command is accel-clamped from ZERO last_control.
        lim = cfg.acc_x_limit * 0.033
        assert abs(r["results"][3]["output_vel"][0]) <= lim + 1e-5

    def test_separate_stuck_timers(self, cfg):
        """Interleaving single and batch solves without explicit delta_t must
        not corrupt either path's wall-clock stuck-timer baseline (ADVICE
        round-2: the ops used to share last_time)."""
        s = self._staged(cfg)
        req = dict(self._robot(0))
        req["op"] = "optimizer"
        req.pop("delta_t", None)
        s.handle(req)                       # sets last_time
        t_single = s.last_time
        assert t_single > 0
        s.handle({"op": "optimizer_batch",
                  "robots": [self._robot(0)]})   # no delta_t => fleet clock
        assert s.last_time == t_single      # batch left the single clock alone
        assert s._fleet_last_time >= t_single

    def test_pipelined_churn_serves_surviving_lanes(self, cfg):
        """Fleet-size change in pipelined mode: surviving lanes get the
        previous tick's real results; only NEW lanes get warmup entries
        (ADVICE round-2: all-or-nothing warmup starved fleets with churn)."""
        fleet = self._staged(cfg, pipelined=True)
        r1 = fleet.handle({"op": "optimizer_batch", "delta_t": 0.033,
                           "robots": [self._robot(i) for i in range(3)]})
        assert all(x.get("pipelined_warmup") for x in r1["results"])
        # Grow 3 -> 4 within the same pad: lanes 0-2 must get tick-1 results.
        r2 = fleet.handle({"op": "optimizer_batch", "delta_t": 0.033,
                           "robots": [self._robot(i) for i in range(4)]})
        assert len(r2["results"]) == 4
        for i in range(3):
            assert "pipelined_warmup" not in r2["results"][i]
            assert abs(r2["results"][i]["output_vel"][0]) > 0
        assert r2["results"][3].get("pipelined_warmup")
        # Shrink 4 -> 2: both surviving lanes get tick-2 results.
        r3 = fleet.handle({"op": "optimizer_batch", "delta_t": 0.033,
                           "robots": [self._robot(i) for i in range(2)]})
        assert len(r3["results"]) == 2
        assert all("pipelined_warmup" not in x for x in r3["results"])

    def test_errors(self, cfg):
        s = OptimizerSession(cfg)
        assert "error" in s.handle({"op": "optimizer_batch",
                                    "robots": [self._robot(0)]})
        s.handle({"op": "set_costmap", "data": np.zeros((20, 20)).tolist(),
                  "origin": [-0.5, -0.5], "resolution": 0.05})
        s.handle({"op": "set_footprint",
                  "points": [[0.1, 0.1], [-0.1, 0.1], [-0.1, -0.1],
                             [0.1, -0.1]]})
        assert "error" in s.handle({"op": "optimizer_batch", "robots": []})

    def test_tcp_fleet_roundtrip(self, cfg):
        ready = threading.Event()
        t = threading.Thread(target=serve,
                             args=("127.0.0.1", 7982, cfg, ready), daemon=True)
        t.start()
        assert ready.wait(10)
        c = OptimizerClient(port=7982, wait_timeout=10)
        c.call({"op": "set_costmap", "data": np.zeros((20, 20)).tolist(),
                "origin": [-0.5, -0.5], "resolution": 0.05})
        c.call({"op": "set_footprint",
                "points": [[0.1, 0.1], [-0.1, 0.1], [-0.1, -0.1],
                           [0.1, -0.1]]})
        r = c.call({"op": "optimizer_batch", "delta_t": 0.033,
                    "robots": [self._robot(i) for i in range(2)]})
        assert len(r["results"]) == 2
        assert all(len(x["output_vel"]) == 3 for x in r["results"])
        c.close()


def test_serving_state_checkpoint_roundtrip(cfg, tmp_path):
    """save_state/load_state ops: a restarted server resumes the exact
    warm-start/latch/timer state (the reference loses it on restart).
    Paths are confined to the configured checkpoint_dir — request paths are
    untrusted network input."""
    def staged(ckpt_dir=str(tmp_path)):
        s = OptimizerSession(cfg, checkpoint_dir=ckpt_dir)
        s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                  "origin": [-1, -1], "resolution": 0.05})
        s.handle({"op": "set_footprint",
                  "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                             [0.3, -0.2]]})
        return s

    # Disabled without a checkpoint_dir; absolute and traversal paths refused.
    s0 = staged(ckpt_dir=None)
    assert "error" in s0.handle({"op": "save_state", "path": "x.npz"})
    s0b = staged()
    assert "error" in s0b.handle({"op": "save_state", "path": "/etc/x.npz"})
    assert "error" in s0b.handle({"op": "save_state", "path": "../x.npz"})
    # Filesystem failures come back as {"error": ...} responses, not
    # connection-killing escaped exceptions (round-5 review: FileNotFoundError
    # was outside handle()'s old except tuple).
    assert "error" in s0b.handle({"op": "load_state", "path": "missing.npz"})
    assert "error" in s0b.handle({"op": "save_state", "path": "no/dir/x.npz"})

    req = {"op": "optimizer", "current_pose": [0, 0, 0],
           "carrot_pose": [0.4, 0.1, 0.2], "goal_pose": [1.0, 0.5, 0.3],
           "current_vel": [0.3, 0, 0], "control_interval": 0.033,
           "delta_t": 0.033}
    s1 = staged()
    s1.handle(req)
    s1.handle(req)
    path = "state.npz"
    assert s1.handle({"op": "save_state", "path": path})["ok"]
    ref = s1.handle(req)

    s2 = staged()
    assert s2.handle({"op": "load_state", "path": path})["ok"]
    got = s2.handle(req)
    np.testing.assert_allclose(got["output_vel"], ref["output_vel"],
                               atol=1e-6)

    # Fleet lanes roundtrip too.
    s3 = staged()
    robots = [{"current_pose": [0.05 * i, 0, 0],
               "carrot_pose": [0.4, 0.1, 0.2], "goal_pose": [1.0, 0.5, 0.3],
               "current_vel": [0.3, 0, 0], "control_interval": 0.033}
              for i in range(3)]
    s3.handle({"op": "optimizer_batch", "robots": robots, "delta_t": 0.033})
    fpath = "fleet.npz"
    r = s3.handle({"op": "save_state", "path": fpath, "fleet": True})
    assert r["ok"] and r["robots"] == 3
    ref_f = s3.handle({"op": "optimizer_batch", "robots": robots,
                       "delta_t": 0.033})

    s4 = staged()
    r = s4.handle({"op": "load_state", "path": fpath, "fleet": True,
                   "robots": 3})
    assert r["ok"] and r["robots"] == 3
    got_f = s4.handle({"op": "optimizer_batch", "robots": robots,
                       "delta_t": 0.033})
    for a, b in zip(got_f["results"], ref_f["results"]):
        np.testing.assert_allclose(a["output_vel"], b["output_vel"],
                                   atol=1e-6)

    # save_state with an unknown robot id errors instead of silently
    # creating a fresh slot (slot creation runs LRU eviction against real
    # robots, and the checkpoint would hold init_state, not the intended
    # robot's warm start). The slot count must not grow.
    s5 = staged()
    s5.handle(dict(req, robot="robot7"))
    n_slots = s5.handle({"op": "ping"})["slots"]
    r = s5.handle({"op": "save_state", "path": "typo.npz", "robot": "robot-7"})
    assert "error" in r and "robot-7" in r["error"]
    assert s5.handle({"op": "ping"})["slots"] == n_slots
    assert s5.handle({"op": "save_state", "path": "ok.npz",
                      "robot": "robot7"})["ok"]
    # load_state MAY create the slot: restoring onto a fresh server is the
    # whole point of the checkpoint (test above relies on it for the
    # default slot; named robots behave the same).
    s6 = staged()
    assert s6.handle({"op": "load_state", "path": "ok.npz",
                      "robot": "robot7"})["ok"]


def test_concurrent_clients(cfg):
    """Multiple robot processes connect SIMULTANEOUSLY (the reference's ROS
    service accepts any number of clients); requests serialize on the
    session lock, and each client gets its own replies in order."""
    ready = threading.Event()
    t = threading.Thread(target=serve,
                         args=("127.0.0.1", 7983, cfg, ready), daemon=True)
    t.start()
    assert ready.wait(10)
    c1 = OptimizerClient(port=7983, wait_timeout=10)
    c2 = OptimizerClient(port=7983, wait_timeout=10)  # connected concurrently
    c1.call({"op": "set_costmap", "data": np.zeros((20, 20)).tolist(),
             "origin": [-0.5, -0.5], "resolution": 0.05})
    c1.call({"op": "set_footprint",
             "points": [[0.1, 0.1], [-0.1, 0.1], [-0.1, -0.1], [0.1, -0.1]]})
    # Client 2 issues requests while client 1 is still connected.
    assert c2.call({"op": "ping"})["ok"]
    r2 = c2.call(_opt_req())
    assert "output_vel" in r2
    r1 = c1.call(_opt_req())
    assert "output_vel" in r1
    errs = []

    def hammer(c, n):
        try:
            for _ in range(n):
                if "ok" not in c.call({"op": "ping"}):
                    errs.append("bad ping")
        except Exception as e:  # pragma: no cover
            errs.append(repr(e))

    th = [threading.Thread(target=hammer, args=(c, 25)) for c in (c1, c2)]
    for x in th:
        x.start()
    for x in th:
        x.join(30)
        assert not x.is_alive(), "hammer thread hung (server lock deadlock?)"
    assert not errs, errs
    c1.close()
    c2.close()


class TestFullTickMode:
    """set_plan/tick ops: the server runs the whole fused controller tick
    (pursuit + solve + post-processing); the thin client sends only
    pose/vel per tick."""

    def _staged(self, cfg):
        s = OptimizerSession(cfg)
        s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                  "origin": [-1, -1], "resolution": 0.05})
        s.handle({"op": "set_footprint",
                  "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                             [0.3, -0.2]]})
        return s

    def test_requires_plan(self, cfg):
        s = self._staged(cfg)
        assert "error" in s.handle({"op": "tick", "pose": [0, 0, 0],
                                    "vel": [0, 0, 0], "delta_t": 0.033})

    def test_matches_controller_facade(self, cfg, empty_costmap, footprint):
        """Full-tick serving == NeoMpcController (the same fused step)."""
        from neo_mpc_planner2_tpu.controller import NeoMpcController
        from neo_mpc_planner2_tpu.utils.se2_np import integrate_cmd_np

        plan = np.stack([np.linspace(0, 2.0, 50), np.zeros(50),
                         np.zeros(50)], 1)
        s = self._staged(cfg)
        assert s.handle({"op": "set_plan", "poses": plan.tolist()})["ok"]

        c = NeoMpcController()
        c.configure(cfg, costmap=empty_costmap, footprint=footprint)
        c.activate()
        c.set_plan(plan)

        pose = np.zeros(3)
        vel = np.zeros(3)
        for _ in range(10):
            r = s.handle({"op": "tick", "pose": pose.tolist(),
                          "vel": vel.tolist(), "delta_t": 1 / 30})
            cmd_ctrl = c.compute_velocity_commands(pose, vel, 1 / 30)
            np.testing.assert_allclose(r["output_vel"], cmd_ctrl, atol=1e-5)
            assert not r["lethal"] and not r["plan_empty"]
            assert r["plan_window"][1] > r["plan_window"][0]
            pose = integrate_cmd_np(pose, np.asarray(r["output_vel"]), 1 / 30)
            vel = np.asarray(r["output_vel"])
        assert pose[0] > 0.1  # made progress along the plan

    def test_lethal_flag(self, cfg, footprint):
        s = OptimizerSession(cfg)
        s.handle({"op": "set_costmap", "data": np.ones((40, 40)).tolist(),
                  "origin": [-1, -1], "resolution": 0.05})
        s.handle({"op": "set_footprint",
                  "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                             [0.3, -0.2]]})
        plan = np.stack([np.linspace(0, 2.0, 50), np.zeros(50),
                         np.zeros(50)], 1)
        s.handle({"op": "set_plan", "poses": plan.tolist()})
        r = s.handle({"op": "tick", "pose": [0, 0, 0], "vel": [0, 0, 0],
                      "delta_t": 0.033})
        assert r["lethal"]
        np.testing.assert_allclose(r["output_vel"], [0, 0, 0])


def test_robot_slots_isolated(cfg):
    """Single-robot ops with distinct "robot" ids keep fully isolated
    state/clock/plan — several robot processes can share one threaded server
    (round-3 review: the shared single session silently cross-polluted
    warm starts and stuck clocks once connections became concurrent)."""
    s = OptimizerSession(cfg)
    s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
              "origin": [-1, -1], "resolution": 0.05})
    s.handle({"op": "set_footprint",
              "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
    # Robot A ticks twice (warm), robot B once (cold): B's first command
    # must equal a fresh session's first command, NOT continue A's ramp.
    ra1 = s.handle(_opt_req(robot="A"))
    ra2 = s.handle(_opt_req(robot="A"))
    rb1 = s.handle(_opt_req(robot="B"))
    np.testing.assert_allclose(rb1["output_vel"], ra1["output_vel"],
                               atol=1e-6)
    assert abs(ra2["output_vel"][0]) > abs(rb1["output_vel"][0]) - 1e-6
    # Full-tick plans are per robot too.
    plan_a = np.stack([np.linspace(0, 2.0, 50), np.zeros(50),
                       np.zeros(50)], 1)
    assert s.handle({"op": "set_plan", "poses": plan_a.tolist(),
                     "robot": "A"})["ok"]
    assert "error" in s.handle({"op": "tick", "pose": [0, 0, 0],
                                "vel": [0, 0, 0], "delta_t": 0.033,
                                "robot": "B"})  # B has no plan
    rt = s.handle({"op": "tick", "pose": [0, 0, 0], "vel": [0, 0, 0],
                   "delta_t": 0.033, "robot": "A"})
    assert "output_vel" in rt


def test_set_plan_same_goal_keeps_hysteresis(cfg):
    """Re-publishing the UNCHANGED plan must not re-latch slow_down
    (cpp:277-279 latches only on goal change; round-3 review finding)."""
    import jax.numpy as jnp
    s = OptimizerSession(cfg)
    s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
              "origin": [-1, -1], "resolution": 0.05})
    s.handle({"op": "set_footprint",
              "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
    plan = np.stack([np.linspace(0, 2.0, 50), np.zeros(50), np.zeros(50)], 1)
    s.handle({"op": "set_plan", "poses": plan.tolist()})
    # Clear the hysteresis by hand (a straight-ahead tick would too).
    s.state = s.state.replace(slow_down=jnp.asarray(False))
    s.handle({"op": "set_plan", "poses": plan.tolist()})     # same goal
    assert not bool(s.state.slow_down)
    plan2 = plan + np.array([0.5, 0.0, 0.0])                 # new goal
    s.handle({"op": "set_plan", "poses": plan2.tolist()})
    assert bool(s.state.slow_down)


def test_tick_rejects_malformed_pose(cfg):
    s = OptimizerSession(cfg)
    s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
              "origin": [-1, -1], "resolution": 0.05})
    s.handle({"op": "set_footprint",
              "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
    plan = np.stack([np.linspace(0, 2.0, 50), np.zeros(50), np.zeros(50)], 1)
    s.handle({"op": "set_plan", "poses": plan.tolist()})
    r = s.handle({"op": "tick", "pose": [0, 0], "vel": [0, 0, 0],
                  "delta_t": 0.033})
    assert "error" in r


def test_reset_clears_plan(cfg):
    """A tick after a new-mission reset must error until the new set_plan
    arrives — not drive toward the previous mission's goal (round-3
    review finding)."""
    s = OptimizerSession(cfg)
    s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
              "origin": [-1, -1], "resolution": 0.05})
    s.handle({"op": "set_footprint",
              "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
    plan = np.stack([np.linspace(0, 2.0, 50), np.zeros(50), np.zeros(50)], 1)
    s.handle({"op": "set_plan", "poses": plan.tolist()})
    s.handle({"op": "tick", "pose": [0, 0, 0], "vel": [0, 0, 0],
              "delta_t": 0.033})
    s.handle({"op": "reset"})
    assert "error" in s.handle({"op": "tick", "pose": [0, 0, 0],
                                "vel": [0, 0, 0], "delta_t": 0.033})


class TestBatchedFullTick:
    """set_plans/tick_batch: server-side pursuit + solve for N robots as one
    device dispatch (the batched counterpart of the full-tick mode)."""

    def _staged(self, cfg):
        s = OptimizerSession(cfg)
        s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                  "origin": [-1, -1], "resolution": 0.05})
        s.handle({"op": "set_footprint",
                  "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                             [0.3, -0.2]]})
        return s

    def test_matches_per_robot_full_tick(self, cfg):
        """tick_batch lane i == a dedicated full-tick slot driving the same
        plan/pose stream (1e-5: vmap fusion reassociation)."""
        s = self._staged(cfg)
        plans = [np.stack([np.linspace(0, 2.0, 50), np.full(50, 0.1 * i),
                           np.zeros(50)], 1) for i in range(3)]
        assert s.handle({"op": "set_plans",
                         "plans": [p.tolist() for p in plans]})["ok"]
        single = self._staged(cfg)
        for i, p in enumerate(plans):
            single.handle({"op": "set_plan", "poses": p.tolist(),
                           "robot": f"r{i}"})
        poses = [[0.0, 0.1 * i, 0.0] for i in range(3)]
        vels = [[0.2, 0, 0]] * 3
        for tick in range(3):
            rb = s.handle({"op": "tick_batch", "delta_t": 1 / 30,
                           "robots": [{"pose": poses[i], "vel": vels[i]}
                                      for i in range(3)]})
            assert len(rb["results"]) == 3
            for i in range(3):
                ri = single.handle({"op": "tick", "pose": poses[i],
                                    "vel": vels[i], "delta_t": 1 / 30,
                                    "robot": f"r{i}"})
                np.testing.assert_allclose(rb["results"][i]["output_vel"],
                                           ri["output_vel"], atol=1e-5)
                assert (rb["results"][i]["plan_window"]
                        == ri["plan_window"])

    def test_count_mismatch_and_restage(self, cfg):
        s = self._staged(cfg)
        plan = np.stack([np.linspace(0, 2.0, 50), np.zeros(50),
                         np.zeros(50)], 1)
        assert "error" in s.handle({"op": "tick_batch", "robots": []})
        s.handle({"op": "set_plans", "plans": [plan.tolist()] * 2})
        r = s.handle({"op": "tick_batch", "delta_t": 1 / 30,
                      "robots": [{"pose": [0, 0, 0], "vel": [0, 0, 0]}] * 3})
        assert "error" in r  # 3 robots vs 2 staged plans
        # Same-goal re-stage keeps hysteresis; grow to 3 works.
        s.handle({"op": "set_plans", "plans": [plan.tolist()] * 3})
        r = s.handle({"op": "tick_batch", "delta_t": 1 / 30,
                      "robots": [{"pose": [0, 0, 0], "vel": [0, 0, 0]}] * 3})
        assert len(r["results"]) == 3
        assert all("output_vel" in x for x in r["results"])


class TestSlotLifecycle:
    """Round-3 verdict item 5: per-robot session slots must not grow without
    bound under churning robot ids. Lifecycle = explicit release op + TTL
    idle expiry + hard LRU cap (enforced at slot creation)."""

    def _staged_session(self, cfg, **kw):
        s = OptimizerSession(cfg, **kw)
        s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                  "origin": [-1, -1], "resolution": 0.05})
        s.handle({"op": "set_footprint",
                  "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                             [0.3, -0.2]]})
        return s

    def test_churn_bounded_by_max_slots(self, cfg):
        """Fails on the round-3 code: slots grew one per distinct robot id."""
        s = self._staged_session(cfg, max_slots=8)
        for i in range(40):
            r = s.handle(_opt_req(robot=f"churn-{i}"))
            assert "output_vel" in r
        assert len(s._slots) <= 8
        # LRU: the most recent ids survive, the oldest are gone.
        assert f"churn-39" in s._slots
        assert f"churn-0" not in s._slots

    def test_release_op(self, cfg):
        s = self._staged_session(cfg)
        s.handle(_opt_req(robot="a"))
        s.handle(_opt_req(robot="b"))
        b_guess = np.asarray(s._slots["b"]["state"].initial_guess).copy()
        r = s.handle({"op": "release", "robot": "a"})
        assert r["ok"] and r["released"]
        assert "a" not in s._slots
        # b's warm state is untouched by a's release.
        np.testing.assert_array_equal(
            np.asarray(s._slots["b"]["state"].initial_guess), b_guess)
        # Releasing a missing slot is a no-op, not an error.
        r2 = s.handle({"op": "release", "robot": "a"})
        assert r2["ok"] and not r2["released"]
        # A returning released robot starts fresh (init_state warm start).
        s._slot({"robot": "a"})
        assert float(np.abs(np.asarray(
            s._slots["a"]["state"].initial_guess)).sum()) == 0.0

    def test_ttl_eviction(self, cfg):
        s = self._staged_session(cfg, slot_ttl=10.0)
        t = [0.0]
        s._slot_clock = lambda: t[0]
        s.handle(_opt_req(robot="old"))
        t[0] = 5.0
        s.handle(_opt_req(robot="kept"))
        t[0] = 14.0  # "old" idle 14s > ttl; "kept" idle 9s < ttl
        s._slot({"robot": "new"})
        assert "old" not in s._slots
        assert "kept" in s._slots and "new" in s._slots

    def test_threaded_churn_no_state_bleed(self, cfg):
        """N threads churning robot ids through the real socket server while
        a persistent robot ticks: slot count stays bounded and the persistent
        robot's commands are bit-equal to a dedicated single-robot session."""
        ready = threading.Event()
        # Cap ABOVE the churn count: this test proves thread-safety and slot
        # isolation (the hard-cap/LRU semantics are proven deterministically
        # in test_churn_bounded_by_max_slots; a cap below the churn count
        # here could legitimately evict the hero's own slot mid-sequence).
        t = threading.Thread(
            target=serve, args=("127.0.0.1", 7984, cfg, ready),
            kwargs={"max_slots": 64}, daemon=True)
        t.start()
        assert ready.wait(10)

        def stage(c):
            c.call({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                    "origin": [-1, -1], "resolution": 0.05})
            c.call({"op": "set_footprint",
                    "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                               [0.3, -0.2]]})

        hero = OptimizerClient(port=7984, wait_timeout=10)
        stage(hero)
        # Reference commands from a dedicated in-process session (same cfg,
        # same staging, no churn anywhere near it).
        ref = self._staged_session(cfg)
        ref_cmds = [ref.handle(_opt_req())["output_vel"] for _ in range(3)]

        errs = []

        def churn(tid):
            try:
                c = OptimizerClient(port=7984, wait_timeout=10)
                for i in range(10):
                    r = c.call(_opt_req(robot=f"t{tid}-r{i}"))
                    if "output_vel" not in r:
                        errs.append(r)
                c.close()
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(repr(e))

        threads = [threading.Thread(target=churn, args=(k,)) for k in range(4)]
        for th in threads:
            th.start()
        got = []
        for _ in range(3):
            got.append(hero.call(_opt_req())["output_vel"])
        for th in threads:
            th.join(60)
        assert not errs, errs
        # Churn (40 distinct ids against the 64-slot cap — wide enough that
        # the hero's default slot is never evicted) never bled into the
        # hero's slot: its 3 commands match the dedicated session.
        np.testing.assert_allclose(got, ref_cmds, atol=1e-6)
        assert hero.call({"op": "ping"})["slots"] <= 64
        hero.close()


class TestCostmapUpdate:
    """op_set_costmap_update — the live-costmap deployment path (round-3
    verdict item 2): dirty-window cell updates + rolling-window moves without
    re-sending the grid, bit-identical to a full re-stage."""

    def _staged(self, cfg, **cm_kw):
        s = OptimizerSession(cfg)
        msg = {"op": "set_costmap", "data": np.zeros((48, 48)).tolist(),
               "origin": [-1.2, -1.2], "resolution": 0.05}
        msg.update(cm_kw)
        assert s.handle(msg)["ok"]
        s.handle({"op": "set_footprint",
                  "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                             [0.3, -0.2]]})
        return s

    def test_update_matches_full_restage(self, cfg):
        """An incremental update and a full re-stage of the same final map
        must produce identical optimizer responses."""
        rng = np.random.default_rng(21)
        block = rng.uniform(0.2, 0.8, (6, 6)).astype(np.float32)

        s_inc = self._staged(cfg)
        assert s_inc.handle({"op": "set_costmap_update",
                             "data": block.tolist(), "lo": [30, 25]})["ok"]
        full = np.zeros((48, 48), np.float32)
        full[25:31, 30:36] = block
        s_full = self._staged(cfg, data=full.tolist())
        r_inc = s_inc.handle(_opt_req())
        r_full = s_full.handle(_opt_req())
        np.testing.assert_array_equal(r_inc["output_vel"], r_full["output_vel"])
        assert r_inc["cost"] == r_full["cost"]

    def test_update_flips_collision(self, cfg):
        """A lethal wall painted over the robot via the update op must flip
        the collision flags on the NEXT tick — the live-map semantics the
        reference gets from its costmap subscription."""
        s = self._staged(cfg)
        r0 = s.handle(_opt_req())
        assert not r0["collision"] and not r0["collision_footprint"]
        wall = np.ones((16, 16), np.float32).tolist()
        assert s.handle({"op": "set_costmap_update", "data": wall,
                         "lo": [18, 18]})["ok"]  # covers world (-0.3..0.5)²
        r1 = s.handle(_opt_req())
        assert r1["collision_footprint"] and r1["output_vel"] == [0, 0, 0]

    def test_rolling_window_move(self, cfg):
        """Window staged via set_costmap(win_cells) + moved via win_lo: the
        solver must see out-of-window cells as lethal, identically to a
        freshly staged view at the new corner."""
        rng = np.random.default_rng(22)
        world = rng.uniform(0.0, 0.5, (96, 96)).astype(np.float32)
        s = self._staged(cfg, data=world.tolist(), origin=[-2.4, -2.4],
                         win_cells=48, win_lo=[0, 0])
        assert s.handle({"op": "set_costmap_update",
                         "win_lo": [24, 24]})["ok"]
        s2 = self._staged(cfg, data=world.tolist(), origin=[-2.4, -2.4],
                          win_cells=48, win_lo=[24, 24])
        r1 = s.handle(_opt_req())
        r2 = s2.handle(_opt_req())
        np.testing.assert_array_equal(r1["output_vel"], r2["output_vel"])

    def test_update_and_window_validation(self, cfg):
        s = OptimizerSession(cfg)
        assert "error" in s.handle({"op": "set_costmap_update",
                                    "data": [[1.0]], "lo": [0, 0]})
        s = self._staged(cfg)
        # Block leaking past the right/top edge is rejected, not clamped
        # (the wire API refuses ambiguity; the library clamps).
        assert "error" in s.handle({"op": "set_costmap_update",
                                    "data": np.ones((4, 4)).tolist(),
                                    "lo": [46, 0]})
        assert "error" in s.handle({"op": "set_costmap_update",
                                    "data": np.ones((4, 4)).tolist(),
                                    "lo": [-1, 0]})
        # win_lo without a configured window.
        assert "error" in s.handle({"op": "set_costmap_update",
                                    "win_lo": [0, 0]})
        # Non-finite cells: same wire-boundary NaN/Inf policy as the full
        # set_costmap stage — reject, don't poison the staged map.
        bad = np.ones((4, 4))
        bad[1, 2] = np.nan
        assert "error" in s.handle({"op": "set_costmap_update",
                                    "data": bad.tolist(), "lo": [0, 0]})
        bad[1, 2] = np.inf
        assert "error" in s.handle({"op": "set_costmap_update",
                                    "data": bad.tolist(), "lo": [0, 0]})
        # Bad window staging.
        assert "error" in s.handle({"op": "set_costmap", 
                                    "data": np.zeros((48, 48)).tolist(),
                                    "win_cells": 64})
        assert "error" in s.handle({"op": "set_costmap",
                                    "data": np.zeros((48, 48)).tolist(),
                                    "win_cells": 32, "win_lo": [20, 0]})

    def test_update_keeps_u8_source_fresh(self, cfg):
        """With the u8 gather source active (solver_costmap_u8=True), the
        update must refresh flat_u8 so the solver never reads stale costs."""
        s = self._staged(cfg.replace(solver_costmap_u8=True))
        assert s.costmap.flat_u8 is not None
        block = (np.ones((6, 6), np.float32) * (200.0 / 255.0))
        assert s.handle({"op": "set_costmap_update", "data": block.tolist(),
                         "lo": [20, 20]})["ok"]
        full = np.zeros((48, 48), np.float32)
        full[20:26, 20:26] = block
        s_full = self._staged(cfg.replace(solver_costmap_u8=True),
                              data=full.tolist())
        r1 = s.handle(_opt_req())
        r2 = s_full.handle(_opt_req())
        np.testing.assert_array_equal(r1["output_vel"], r2["output_vel"])


class TestShardedFleetServing:
    """Round-3 verdict item 4 (serving x sharding composition): fleet ticks
    (optimizer_batch / tick_batch) shard their lane axis over every visible
    device — 8 virtual CPU devices under this conftest — with per-lane
    results equal to the single-device path and a checkpoint round-trip of
    the sharded fleet state."""

    def _staged(self, cfg, **kw):
        s = OptimizerSession(cfg, **kw)
        s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
                  "origin": [-1, -1], "resolution": 0.05})
        s.handle({"op": "set_footprint",
                  "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                             [0.3, -0.2]]})
        return s

    def _robots(self, n):
        return [{"current_pose": [0, 0.05 * i, 0], "carrot_pose": [0.4, 0.1, 0.1],
                 "goal_pose": [1.0, 0.5, 0.2], "current_vel": [0.2, 0, 0]}
                for i in range(n)]

    def test_fleet_state_spans_devices(self, cfg):
        import jax
        assert jax.device_count() == 8  # the conftest virtual mesh
        s = self._staged(cfg)
        r = s.handle({"op": "optimizer_batch", "delta_t": 1 / 30,
                      "robots": self._robots(6)})
        assert len(r["results"]) == 6
        # Lanes padded to a device multiple and sharded over all 8 devices.
        st = s._fleet_state.initial_guess
        assert st.shape[0] % 8 == 0
        assert len(st.sharding.device_set) == 8

    def test_per_lane_equality_with_single_device(self, cfg):
        """Per-lane commands from the sharded fleet equal dedicated
        single-robot sessions (the single-device executable) over a
        3-tick stateful sequence."""
        s = self._staged(cfg)
        singles = [self._staged(cfg) for _ in range(3)]
        robots = self._robots(3)
        for tick in range(3):
            rb = s.handle({"op": "optimizer_batch", "delta_t": 1 / 30,
                           "robots": robots})
            for i in range(3):
                ri = singles[i].handle({"op": "optimizer", "delta_t": 1 / 30,
                                        "control_interval": cfg.control_interval,
                                        **robots[i]})
                np.testing.assert_allclose(rb["results"][i]["output_vel"],
                                           ri["output_vel"], atol=1e-5)

    def test_sharded_tick_batch(self, cfg):
        """The batched FULL-tick fleet (server-side pursuit) also shards:
        per-lane equality with per-robot full-tick sessions."""
        s = self._staged(cfg)
        plans = [np.stack([np.linspace(0, 2.0, 50), np.full(50, 0.1 * i),
                           np.zeros(50)], 1) for i in range(3)]
        assert s.handle({"op": "set_plans",
                         "plans": [p.tolist() for p in plans]})["ok"]
        assert s._ftick_state.initial_guess.shape[0] % 8 == 0
        single = self._staged(cfg)
        for i, p in enumerate(plans):
            single.handle({"op": "set_plan", "poses": p.tolist(),
                           "robot": f"r{i}"})
        for tick in range(2):
            rb = s.handle({"op": "tick_batch", "delta_t": 1 / 30,
                           "robots": [{"pose": [0, 0.1 * i, 0],
                                       "vel": [0.2, 0, 0]}
                                      for i in range(3)]})
            if tick == 0:
                # After the first sharded dispatch the carried lane state
                # comes back tiled over the whole mesh.
                assert len(s._ftick_state.initial_guess
                           .sharding.device_set) == 8
            for i in range(3):
                ri = single.handle({"op": "tick", "pose": [0, 0.1 * i, 0],
                                    "vel": [0.2, 0, 0], "delta_t": 1 / 30,
                                    "robot": f"r{i}"})
                np.testing.assert_allclose(rb["results"][i]["output_vel"],
                                           ri["output_vel"], atol=1e-5)

    def test_sharded_fleet_checkpoint_roundtrip(self, cfg, tmp_path):
        """save_state -> reset -> load_state of the SHARDED fleet state:
        continuing from the checkpoint matches an uninterrupted run
        lane for lane."""
        robots = self._robots(5)
        a = self._staged(cfg, checkpoint_dir=str(tmp_path))
        b = self._staged(cfg, checkpoint_dir=str(tmp_path))
        for s in (a, b):
            s.handle({"op": "optimizer_batch", "delta_t": 1 / 30,
                      "robots": robots})
            s.handle({"op": "optimizer_batch", "delta_t": 1 / 30,
                      "robots": robots})
        r = a.handle({"op": "save_state", "path": "fleet.npz", "fleet": True})
        assert r["ok"] and r["robots"] == 5
        a.handle({"op": "reset"})
        # Re-stage after the reset (reset drops maps? it drops fleet lanes;
        # maps persist) then restore.
        r = a.handle({"op": "load_state", "path": "fleet.npz", "fleet": True,
                      "robots": 5})
        assert r["ok"] and r["robots"] == 5 and r["lanes"] % 8 == 0
        ra = a.handle({"op": "optimizer_batch", "delta_t": 1 / 30,
                       "robots": robots})
        rb = b.handle({"op": "optimizer_batch", "delta_t": 1 / 30,
                       "robots": robots})
        for i in range(5):
            np.testing.assert_allclose(ra["results"][i]["output_vel"],
                                       rb["results"][i]["output_vel"],
                                       atol=1e-6)


def test_json_default_numpy_and_typeerror():
    """_json_default encodes numpy arrays as lists and raises the standard
    TypeError (naming the type) for anything else — not the opaque
    AttributeError a bare `o.tolist()` default did (advisor round 4)."""
    import json

    import pytest

    from neo_mpc_planner2_tpu.serving import _json_default

    s = json.dumps({"data": np.arange(3, dtype=np.float32)},
                   default=_json_default)
    assert json.loads(s) == {"data": [0.0, 1.0, 2.0]}
    with pytest.raises(TypeError, match="object"):
        json.dumps({"bad": object()}, default=_json_default)


def test_product_mode_session(cfg):
    """parity=False serves PRODUCT mode (round 5): the session's executables
    run the smooth objective through the same SQP. Commands must be sane,
    converged, and DIFFERENT from the parity session's on a graded map
    (bilinear gradients steer; parity's nearest-cell term doesn't)."""
    import dataclasses

    pcfg = cfg.replace(
        parallel_line_search=True,
        compat=dataclasses.replace(
            cfg.compat, buggy_odom_yaw=False, footprint_alias_noop=False,
            lethal_1000x=False, unsquared_control_cost=False,
            no_angle_wrap=False),
        w_costmap=2.0)
    # Graded cost ahead: product mode sees lateral gradients.
    yy, xx = np.meshgrid(np.arange(40) * 0.05 - 1.0,
                         np.arange(40) * 0.05 - 1.0, indexing="ij")
    grid = 0.9 * np.exp(-(((xx - 0.4) ** 2) + yy ** 2) / 0.04)

    def drive(session):
        session.handle({"op": "set_costmap", "data": grid.tolist(),
                        "origin": [-1, -1], "resolution": 0.05})
        session.handle({"op": "set_footprint",
                        "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                                   [0.3, -0.2]]})
        return session.handle(_opt_req(current_vel=[0.3, 0, 0]))

    rp = drive(OptimizerSession(pcfg, parity=False))
    rr = drive(OptimizerSession(cfg.replace(w_costmap=2.0)))
    assert "output_vel" in rp and np.isfinite(rp["output_vel"]).all()
    assert rp["success"] is True
    assert not np.allclose(rp["output_vel"], rr["output_vel"])

    # op_configure rebuilds keep product mode (weights change, same mode).
    s = OptimizerSession(pcfg, parity=False)
    drive(s)
    s.handle({"op": "configure", "params": {"prediction_horizon": 0.9}})
    assert s.parity is False
    r2 = s.handle(_opt_req(current_vel=[0.3, 0, 0]))
    assert "output_vel" in r2 and np.isfinite(r2["output_vel"]).all()


def test_product_mode_full_tick(cfg):
    """Product mode through the FULL-TICK path (set_plan + tick): the
    batched controller step builds with parity=False."""
    import dataclasses

    pcfg = cfg.replace(
        parallel_line_search=True,
        compat=dataclasses.replace(
            cfg.compat, buggy_odom_yaw=False, footprint_alias_noop=False,
            lethal_1000x=False, unsquared_control_cost=False,
            no_angle_wrap=False))
    s = OptimizerSession(pcfg, parity=False)
    s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
              "origin": [-1, -1], "resolution": 0.05})
    s.handle({"op": "set_footprint",
              "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
    plan = [[0.05 * i, 0.0, 0.0] for i in range(30)]
    s.handle({"op": "set_plan", "poses": plan})
    pose, vel = [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]
    for _ in range(8):
        r = s.handle({"op": "tick", "pose": pose, "vel": vel,
                      "delta_t": 1 / 30})
        assert "output_vel" in r, r
        vel = r["output_vel"]
        pose = [pose[0] + vel[0] / 30, pose[1] + vel[1] / 30,
                pose[2] + vel[2] / 30]
    assert pose[0] > 0.02  # moved along the plan under product control
