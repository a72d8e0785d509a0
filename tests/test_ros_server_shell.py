"""RosOptimizerServer shell under the fake-rclpy harness (round-4 verdict
item 3b): construct the rclpy node twin FOR REAL and drive its wiring —
subscriptions, service callback, dynamic parameters, the dirty-bbox costmap
diff/restage path and the update-topic merge (ros_adapter.py:233-369) —
against a live OptimizerSession. The reference's equivalent wiring is its
most battle-tested path (mpc_optimization_server.py:44-153)."""

from types import SimpleNamespace as NS

import numpy as np
import pytest

from neo_mpc_planner2_tpu import ros_adapter as ra

import fake_rclpy
from test_ros_adapter import _request, _response


@pytest.fixture()
def server(cfg, monkeypatch):
    fake_rclpy.install(monkeypatch)

    srv_type = type("Optimizer", (), {})
    srv = ra.RosOptimizerServer(srv_type, cfg=cfg)
    # Spy on every op the shell sends its session (order + payloads).
    ops = []
    real_handle = srv.session.handle

    def spy(msg):
        ops.append(msg)
        return real_handle(msg)

    monkeypatch.setattr(srv.session, "handle", spy)
    return srv, ops


def _grid_msg(grid, origin=(-1.0, -1.0), resolution=0.05):
    h, w = grid.shape
    # nav2 publishes occupancy 0..100 / -1; invert the adapter's cost
    # normalization so `grid` (cost [0,1]) round-trips exactly for the
    # values used here (multiples of 1/100).
    data = np.rint(np.asarray(grid) * 100.0).astype(np.int8).reshape(-1)
    return NS(info=NS(height=h, width=w, resolution=resolution,
                      origin=NS(position=NS(x=origin[0], y=origin[1]))),
              data=data)


def _footprint_msg():
    pts = [NS(x=0.3, y=0.2), NS(x=-0.3, y=0.2), NS(x=-0.3, y=-0.2),
           NS(x=0.3, y=-0.2)]
    return NS(polygon=NS(points=pts))


def test_shell_wiring(server):
    srv, _ = server
    assert srv.node.node_name == "mpc_optimization_server"
    assert "optimizer" in srv.node.services
    assert set(srv.node.subscriptions) == {
        "/local_costmap/published_footprint",
        "/local_costmap/costmap",
        "/local_costmap/costmap_updates",
    }
    assert srv.node.param_callbacks
    # Parameter surface declared 1:1 from MpcConfig (reference py:49-75).
    for name in ("lookahead_dist_min", "max_vel_trans", "acc_x_limit"):
        assert name in srv.node.params


def test_service_before_staging_rejected_safely(server):
    """No costmap staged -> zero command + a warn, NOT the reference's
    crash-the-executor behavior (§2.3.10)."""
    srv, _ = server
    resp = srv.node.call_service("optimizer", _request(), _response())
    tw = resp.output_vel.twist
    assert (tw.linear.x, tw.linear.y, tw.angular.z) == (0.0, 0.0, 0.0)
    assert srv.node.get_logger().warnings


def test_full_stack_tick(server):
    """footprint + costmap via subscriptions, then the service solves."""
    srv, ops = server
    srv.node.publish("/local_costmap/published_footprint", _footprint_msg())
    srv.node.publish("/local_costmap/costmap",
                     _grid_msg(np.zeros((32, 32), np.float32)))
    assert [o["op"] for o in ops] == ["set_footprint", "set_costmap"]
    resp = srv.node.call_service("optimizer", _request(), _response())
    tw = resp.output_vel.twist
    assert np.isfinite([tw.linear.x, tw.linear.y, tw.angular.z]).all()
    assert abs(tw.linear.x) > 1e-4  # commanded toward the carrot


def test_costmap_diff_restage(server):
    """A second full-grid message with a small change rides the dirty-bbox
    set_costmap_update path, not a full restage; an unchanged message sends
    nothing."""
    srv, ops = server
    base = np.zeros((32, 32), np.float32)
    srv.node.publish("/local_costmap/costmap", _grid_msg(base))
    srv.node.publish("/local_costmap/costmap", _grid_msg(base))  # no-op
    changed = base.copy()
    changed[10:13, 20:22] = 0.5
    srv.node.publish("/local_costmap/costmap", _grid_msg(changed))
    kinds = [o["op"] for o in ops]
    assert kinds == ["set_costmap", "set_costmap_update"]
    upd = ops[-1]
    h, w = upd["data"].shape
    # Power-of-two padded dirty block covering rows 10-12 / cols 20-21.
    assert (h, w) == (4, 2) and upd["lo"] == [20, 10]


def test_update_topic_merges_through_diff_path(server):
    srv, ops = server
    base = np.zeros((32, 32), np.float32)
    srv.node.publish("/local_costmap/costmap", _grid_msg(base))
    upd = NS(x=5, y=7, width=3, height=2,
             data=np.full(6, 50, np.int8))  # occupancy 50 -> cost 0.5
    srv.node.publish("/local_costmap/costmap_updates", upd)
    assert [o["op"] for o in ops] == ["set_costmap", "set_costmap_update"]
    # The staged device map carries the merged patch.
    staged = np.asarray(srv.session.costmap.data)
    assert staged[7, 5] == pytest.approx(0.5)
    assert staged[8, 7] == pytest.approx(0.5)
    assert staged[0, 0] == 0.0


def test_oversize_update_drops_baseline(server):
    """An update window exceeding the staged grid (geometry-change race):
    warn, drop the diff baseline, and the next full grid restages
    unconditionally (advisor round 4)."""
    srv, ops = server
    base = np.zeros((16, 16), np.float32)
    srv.node.publish("/local_costmap/costmap", _grid_msg(base))
    big = NS(x=10, y=10, width=8, height=8, data=np.zeros(64, np.int8))
    srv.node.publish("/local_costmap/costmap_updates", big)
    assert srv._last_grid is None
    assert srv.node.get_logger().warnings
    # An in-bounds update racing ahead of the restage must be DISCARDED,
    # not forwarded blind — its cell coords belong to the new geometry and
    # the staged device map is stale (round-5 review finding).
    small = NS(x=0, y=0, width=2, height=2, data=np.full(4, 100, np.int8))
    srv.node.publish("/local_costmap/costmap_updates", small)
    assert [o["op"] for o in ops] == ["set_costmap"]
    # Next full grid (same content!) must full-restage, not no-op diff.
    srv.node.publish("/local_costmap/costmap", _grid_msg(base))
    assert [o["op"] for o in ops] == ["set_costmap", "set_costmap"]
    # And with the baseline restored, updates flow again.
    srv.node.publish("/local_costmap/costmap_updates", small)
    assert ops[-1]["op"] == "set_costmap_update"


def test_dynamic_parameters(server):
    srv, ops = server
    results = srv.node.set_parameters({"lookahead_dist_min": 0.55})
    assert all(r.successful for r in results)
    assert ops[-1]["op"] == "configure"
    assert srv.session.cfg.lookahead_dist_min == pytest.approx(0.55)


def test_rejected_stage_drops_baseline(server, monkeypatch):
    """A rejected set_costmap keeps the diff baseline at None so the next
    message restages (ros_adapter._apply_refresh contract)."""
    srv, ops = server
    base = np.zeros((16, 16), np.float32)
    real_handle = srv.session.handle

    def failing(msg):
        if msg["op"] == "set_costmap":
            ops.append(msg)
            return {"error": "injected"}
        return real_handle(msg)

    monkeypatch.setattr(srv.session, "handle", failing)
    srv.node.publish("/local_costmap/costmap", _grid_msg(base))
    assert srv._last_grid is None and srv.node.get_logger().warnings
