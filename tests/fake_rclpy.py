"""Fake rclpy module harness (round-4 verdict item 3b): just enough of the
rclpy / ROS-message import surface for `RosOptimizerServer` — the rclpy twin
of the reference's server node (ros_adapter.py:233-369) — to be CONSTRUCTED
and driven for real without ROS: subscriptions fire, the service callback
runs, the dynamic-parameter callback runs, the dirty-bbox costmap diffing
path executes against a live OptimizerSession.

install(monkeypatch) registers the fake modules in sys.modules under the
names ros_adapter lazily imports (`rclpy.node`, `geometry_msgs.msg`,
`nav_msgs.msg`, `map_msgs.msg`, `rcl_interfaces.msg`) and flips
ros_adapter.HAVE_RCLPY; monkeypatch unwinds everything at test teardown, so
the fakes never leak into other tests.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace as NS


class FakeLogger:
    def __init__(self):
        self.warnings: list = []
        self.infos: list = []

    def warn(self, msg):
        self.warnings.append(str(msg))

    def info(self, msg):
        self.infos.append(str(msg))

    error = warn


class FakeParameter:
    """Duck-type of rclpy.Parameter for the set-parameters callback path."""

    def __init__(self, name, value):
        self.name = name
        self.value = value


class FakeNode:
    """Stand-in for rclpy.node.Node: records the wiring the server shell
    creates (parameters, subscriptions, services, param callback) and offers
    harness hooks to drive it (publish / call_service / set_parameters) the
    way the rclpy executor would."""

    def __init__(self, name: str):
        self.node_name = name
        self.params: dict = {}
        self.subscriptions: dict = {}   # topic -> (msg_type, callback)
        self.services: dict = {}        # name -> (srv_type, callback)
        self.param_callbacks: list = []
        self._logger = FakeLogger()

    # --- the API surface ros_adapter touches -----------------------------
    def declare_parameter(self, name, value):
        self.params.setdefault(name, value)

    def get_parameter(self, name):
        return NS(value=self.params[name])

    def create_service(self, srv_type, name, callback):
        self.services[name] = (srv_type, callback)
        return NS(srv_type=srv_type, name=name)

    def create_subscription(self, msg_type, topic, callback, qos):
        self.subscriptions[topic] = (msg_type, callback)
        return NS(msg_type=msg_type, topic=topic, qos=qos)

    def add_on_set_parameters_callback(self, callback):
        self.param_callbacks.append(callback)
        return NS(callback=callback)

    def get_logger(self):
        return self._logger

    # --- harness hooks (what the executor / parameter service would do) --
    def publish(self, topic: str, msg):
        self.subscriptions[topic][1](msg)

    def call_service(self, name: str, request, response):
        return self.services[name][1](request, response)

    def set_parameters(self, updates: dict):
        results = []
        ps = [FakeParameter(k, v) for k, v in updates.items()]
        for cb in self.param_callbacks:
            results.append(cb(ps))
        for k, v in updates.items():
            self.params[k] = v
        return results


class SetParametersResult:
    def __init__(self, successful=False, reason=""):
        self.successful = successful
        self.reason = reason


def _module(name: str, **attrs) -> types.ModuleType:
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def install(monkeypatch):
    """Register the fake module tree and enable the rclpy shell. Returns the
    fake `rclpy` root module (its .node.Node is FakeNode)."""
    # Marker message classes: ros_adapter only passes them to
    # create_subscription, so bare types suffice; actual messages in tests
    # are duck-typed SimpleNamespace trees like the real DDS-deserialized
    # objects.
    polygon_stamped = type("PolygonStamped", (), {})
    occupancy_grid = type("OccupancyGrid", (), {})
    occupancy_grid_update = type("OccupancyGridUpdate", (), {})

    node_mod = _module("rclpy.node", Node=FakeNode)
    rclpy_mod = _module("rclpy", node=node_mod,
                        Parameter=FakeParameter)
    geometry_msg = _module("geometry_msgs.msg",
                           PolygonStamped=polygon_stamped)
    nav_msg = _module("nav_msgs.msg", OccupancyGrid=occupancy_grid)
    map_msg = _module("map_msgs.msg",
                      OccupancyGridUpdate=occupancy_grid_update)
    rcl_msg = _module("rcl_interfaces.msg",
                      SetParametersResult=SetParametersResult)

    for name, mod in [
        ("rclpy", rclpy_mod), ("rclpy.node", node_mod),
        ("geometry_msgs", _module("geometry_msgs", msg=geometry_msg)),
        ("geometry_msgs.msg", geometry_msg),
        ("nav_msgs", _module("nav_msgs", msg=nav_msg)),
        ("nav_msgs.msg", nav_msg),
        ("map_msgs", _module("map_msgs", msg=map_msg)),
        ("map_msgs.msg", map_msg),
        ("rcl_interfaces", _module("rcl_interfaces", msg=rcl_msg)),
        ("rcl_interfaces.msg", rcl_msg),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)

    from neo_mpc_planner2_tpu import ros_adapter

    monkeypatch.setattr(ros_adapter, "HAVE_RCLPY", True)
    return rclpy_mod
