"""ros_adapter tests: the pure message-translation layer and the service
callback core, exercised with duck-typed ROS-message stand-ins (no rclpy in
this environment; the rclpy shell is import-guarded and raises cleanly)."""

import math
from types import SimpleNamespace as NS

import numpy as np
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu import ros_adapter as ra
from neo_mpc_planner2_tpu.serving import OptimizerSession


def _quat(yaw):
    w, x, y, z = ra.quaternion_from_yaw(yaw)
    return NS(x=x, y=y, z=z, w=w)


def _pose(x, y, yaw):
    return NS(position=NS(x=x, y=y, z=0.0), orientation=_quat(yaw))


def _pose_stamped(x, y, yaw):
    return NS(pose=_pose(x, y, yaw), header=NS(frame_id="map"))


def _twist(vx, vy, wz):
    return NS(linear=NS(x=vx, y=vy, z=0.0), angular=NS(x=0.0, y=0.0, z=wz))


def _request(pose=(0, 0, 0.3), carrot=(0.4, 0.1, 0.2), goal=(1.0, 0.5, 0.3),
             vel=(0.2, 0.0, 0.0)):
    return NS(current_pose=_pose_stamped(*pose),
              carrot_pose=_pose_stamped(*carrot),
              goal_pose=_pose(*goal),      # bare Pose, like the schema
              current_vel=_twist(*vel),
              switch_opt=False, control_interval=1 / 30)


def _response():
    return NS(output_vel=NS(twist=_twist(0, 0, 0),
                            header=NS(frame_id="")))


def test_yaw_quaternion_roundtrip():
    for yaw in [-3.0, -1.2, 0.0, 0.7, 2.9]:
        q = _quat(yaw)
        got = ra.euler_yaw_from_quaternion(q.x, q.y, q.z, q.w)
        assert abs(math.atan2(math.sin(yaw - got), math.cos(yaw - got))) < 1e-9


def test_request_translation():
    msg = ra.request_to_msg(_request(), delta_t=0.033)
    np.testing.assert_allclose(msg["current_pose"], [0, 0, 0.3], atol=1e-7)
    np.testing.assert_allclose(msg["carrot_pose"], [0.4, 0.1, 0.2], atol=1e-7)
    np.testing.assert_allclose(msg["goal_pose"], [1.0, 0.5, 0.3], atol=1e-7)
    np.testing.assert_allclose(msg["current_vel"], [0.2, 0, 0], atol=1e-7)
    assert msg["op"] == "optimizer" and msg["delta_t"] == 0.033


def test_callback_core_end_to_end(cfg):
    """Full service callback against a real session: same command as the
    wire-protocol op fed the identical request."""
    s = OptimizerSession(cfg)
    s.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
              "origin": [-1, -1], "resolution": 0.05})
    s.handle({"op": "set_footprint",
              "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]})
    resp = ra.optimizer_callback_core(s, _request(), _response(),
                                      delta_t=0.033)
    got = [resp.output_vel.twist.linear.x, resp.output_vel.twist.linear.y,
           resp.output_vel.twist.angular.z]

    s2 = OptimizerSession(cfg)
    s2.handle({"op": "set_costmap", "data": np.zeros((40, 40)).tolist(),
               "origin": [-1, -1], "resolution": 0.05})
    s2.handle({"op": "set_footprint",
               "points": [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2],
                          [0.3, -0.2]]})
    want = s2.handle(ra.request_to_msg(_request(), delta_t=0.033))
    np.testing.assert_allclose(got, want["output_vel"], atol=1e-7)
    assert np.abs(np.asarray(got)).max() > 0


def test_callback_core_rejects_unstaged(cfg):
    """Missing footprint -> explicit RuntimeError, NOT the reference's
    executor crash (SURVEY.md §2.3.10)."""
    s = OptimizerSession(cfg)
    with pytest.raises(RuntimeError, match="costmap"):
        ra.optimizer_callback_core(s, _request(), _response(), delta_t=0.033)


def test_footprint_msg_translation(cfg):
    msg = NS(polygon=NS(points=[NS(x=0.3, y=0.2, z=0.0),
                                NS(x=-0.3, y=0.2, z=0.0),
                                NS(x=-0.3, y=-0.2, z=0.0),
                                NS(x=0.3, y=-0.2, z=0.0)]))
    pts = ra.footprint_msg_to_points(msg)
    assert pts == [[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]]
    s = OptimizerSession(cfg)
    assert s.handle({"op": "set_footprint", "points": pts})["ok"]


def test_occupancy_grid_translation(cfg):
    grid = NS(info=NS(width=3, height=2, resolution=0.1,
                      origin=NS(position=NS(x=-0.5, y=-0.4, z=0.0))),
              data=[0, 50, 100, -1, 25, 0])
    msg = ra.occupancy_grid_to_costmap_msg(grid)
    np.testing.assert_allclose(
        msg["data"], [[0.0, 0.5, 1.0], [1.0, 0.25, 0.0]])
    assert msg["origin"] == [-0.5, -0.4] and msg["resolution"] == 0.1
    s = OptimizerSession(cfg)
    r = s.handle(msg)
    assert r["ok"] and r["shape"] == [2, 3]


def test_occupancy_grid_update_translation(cfg):
    """map_msgs/OccupancyGridUpdate -> set_costmap_update op; applying it to
    a staged session equals restaging the full grid with the block painted
    in (the update path is bit-identical to a restage)."""
    base = np.zeros((24, 24), np.float32)
    upd = NS(x=5, y=8, width=3, height=2, data=[100, 50, 0, -1, 25, 75])
    op = ra.occupancy_grid_update_to_msg(upd)
    assert op["op"] == "set_costmap_update" and op["lo"] == [5, 8]
    np.testing.assert_allclose(op["data"], [[1.0, 0.5, 0.0],
                                            [1.0, 0.25, 0.75]])

    s = OptimizerSession(cfg)
    assert "error" in s.handle(op)  # no grid staged yet -> explicit error
    s.handle({"op": "set_costmap", "data": base.tolist(),
              "origin": [-0.6, -0.6], "resolution": 0.05})
    assert s.handle(op)["ok"]
    want = base.copy()
    want[8:10, 5:8] = op["data"]
    np.testing.assert_allclose(np.asarray(s.costmap.data), want)


def test_costmap_refresh_op_diff():
    """costmap_refresh_op: full stage on first/geometry-change, None when
    unchanged, dirty-bbox set_costmap_update otherwise."""
    meta = ((-1.0, -1.0), 0.05)
    g0 = np.zeros((32, 32), np.float32)
    op = ra.costmap_refresh_op(None, None, g0, meta)
    assert op["op"] == "set_costmap" and op["resolution"] == 0.05

    assert ra.costmap_refresh_op(g0, meta, g0.copy(), meta) is None

    g1 = g0.copy()
    g1[10, 4] = 0.7
    g1[12, 9] = 1.0
    op = ra.costmap_refresh_op(g0, meta, g1, meta)
    assert op["op"] == "set_costmap_update"
    # The true dirty bbox is (3, 6) at [4, 10]; the op pads to power-of-two
    # dims so the serving session's shape-specialized executable set stays
    # bounded (a fresh compile per bbox shape would stall a live deployment).
    assert op["lo"] == [4, 10] and op["data"].shape == (4, 8)
    # Applying the (padded) diff op reproduces g1 exactly — padded cells
    # carry values identical to what is already staged.
    patched = g0.copy()
    y, x = op["lo"][1], op["lo"][0]
    patched[y:y + op["data"].shape[0], x:x + op["data"].shape[1]] = op["data"]
    np.testing.assert_array_equal(patched, g1)
    # Padded shapes are drawn from the bounded power-of-two set.
    h, w = op["data"].shape
    assert h & (h - 1) == 0 and w & (w - 1) == 0

    # A dirty cell at the far edge: the padded corner shifts to stay inside.
    g2 = g1.copy()
    g2[31, 31] = 0.9
    g2[29, 30] = 0.8
    op = ra.costmap_refresh_op(g1, meta, g2, meta)
    y, x = op["lo"][1], op["lo"][0]
    h, w = op["data"].shape
    assert y + h <= 32 and x + w <= 32 and y >= 0 and x >= 0
    patched = g1.copy()
    patched[y:y + h, x:x + w] = op["data"]
    np.testing.assert_array_equal(patched, g2)

    # Geometry moved (rolling local costmap re-anchoring): full restage.
    op = ra.costmap_refresh_op(g1, meta, g1, ((-0.9, -1.0), 0.05))
    assert op["op"] == "set_costmap"


def test_translation_helpers_compose_with_tcp_client(cfg):
    """The documented translate-then-OptimizerClient composition must work
    over the real socket: the helpers put numpy arrays in op['data'], and
    the client encodes them as nested lists at the wire boundary."""
    import threading

    from neo_mpc_planner2_tpu.serving import OptimizerClient, serve

    ready = threading.Event()
    threading.Thread(target=serve, args=("127.0.0.1", 7987, cfg, ready),
                     daemon=True).start()
    assert ready.wait(10)
    c = OptimizerClient(port=7987, wait_timeout=10)
    grid = NS(info=NS(width=24, height=24, resolution=0.05,
                      origin=NS(position=NS(x=-0.6, y=-0.6, z=0.0))),
              data=[0] * (24 * 24))
    assert c.call(ra.occupancy_grid_to_costmap_msg(grid))["ok"]
    upd = NS(x=3, y=4, width=2, height=2, data=[100, 100, 100, 100])
    assert c.call(ra.occupancy_grid_update_to_msg(upd))["ok"]
    c.close()


def test_rclpy_shell_import_guarded():
    assert not ra.HAVE_RCLPY  # this environment has no ROS
    with pytest.raises(ImportError, match="rclpy"):
        ra.RosOptimizerServer(srv_type=object)
