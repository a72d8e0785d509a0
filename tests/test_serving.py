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
