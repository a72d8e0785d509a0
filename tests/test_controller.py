"""NeoMpcController facade tests: the nav2_core::Controller lifecycle surface
(configure/activate/setPlan/computeVelocityCommands/setSpeedLimit) and its
exception behavior (cpp:70, :235)."""

import numpy as np
import pytest

import neo_mpc_planner2_tpu as mpc
from neo_mpc_planner2_tpu.controller import ControllerException, NeoMpcController


@pytest.fixture()
def ctrl(cfg, empty_costmap, footprint):
    c = NeoMpcController()
    c.configure(cfg, costmap=empty_costmap, footprint=footprint)
    c.activate()
    return c


def _line_plan(n=50, length=2.0):
    return np.stack([np.linspace(0, length, n), np.zeros(n), np.zeros(n)], 1)


class TestLifecycle:
    def test_tick_before_activate_raises(self, cfg, empty_costmap, footprint):
        c = NeoMpcController()
        c.configure(cfg, costmap=empty_costmap, footprint=footprint)
        with pytest.raises(ControllerException):
            c.compute_velocity_commands([0, 0, 0], [0, 0, 0], 0.033)

    def test_tick_without_plan_raises(self, ctrl):
        with pytest.raises(ControllerException):
            ctrl.compute_velocity_commands([0, 0, 0], [0, 0, 0], 0.033)

    def test_configure_from_ros_param_dict(self, empty_costmap, footprint):
        c = NeoMpcController()
        c.configure({"prediction_horizon": 0.8, "control_steps": 3,
                     "max_vel_trans": 0.6}, costmap=empty_costmap,
                    footprint=footprint)
        assert c.cfg.max_vel_trans == 0.6
        assert c.cfg.dt == pytest.approx(0.8 / 3)


class TestTick:
    def test_follows_plan(self, ctrl):
        ctrl.set_plan(_line_plan())
        pose = np.zeros(3)
        vel = np.zeros(3)
        for _ in range(30):
            cmd = ctrl.compute_velocity_commands(pose, vel, 1 / 30)
            from neo_mpc_planner2_tpu.utils.se2_np import integrate_cmd_np
            pose = integrate_cmd_np(pose, cmd, 1 / 30)
            vel = cmd
        assert pose[0] > 0.2
        assert abs(pose[1]) < 0.05

    def test_lethal_raises(self, cfg, footprint):
        c = NeoMpcController()
        lethal = mpc.Costmap.create(np.ones((40, 40)), origin=(-1.0, -1.0),
                                    resolution=0.05)
        c.configure(cfg, costmap=lethal, footprint=footprint)
        c.activate()
        c.set_plan(_line_plan())
        with pytest.raises(ControllerException, match="MPC detected collision"):
            c.compute_velocity_commands([0, 0, 0], [0, 0, 0], 0.033)

    def test_debug_msgs(self, ctrl):
        ctrl.set_plan(_line_plan())
        ctrl.compute_velocity_commands([0, 0, 0], [0.1, 0, 0], 0.033)
        msgs = ctrl.debug_msgs()
        assert msgs["lookahead_point"]["point"]["z"] == 0.01
        assert len(msgs["local_plan"]["poses"]) == ctrl.cfg.control_steps + 1
        assert len(msgs["received_global_plan"]["poses"]) > 0

    def test_received_global_plan_window(self, ctrl):
        """The transformed-plan window (received_global_plan, cpp:119-128):
        base-frame poses from the closest plan pose out to half the costmap
        extent."""
        ctrl.set_plan(_line_plan())           # 2 m straight line, 50 poses
        pose = [0.6, 0.1, 0.2]
        ctrl.compute_velocity_commands(pose, [0.1, 0, 0], 0.033)
        w = ctrl.transformed_plan()
        assert len(w) > 0
        # First window pose is the closest plan pose — near the robot.
        assert np.hypot(w[0, 0], w[0, 1]) < 0.15
        # All within half the 40-cell/0.05 m map extent (1.0 m).
        assert np.hypot(w[:, 0], w[:, 1]).max() <= 1.0 + 1e-6
        # Base-frame check: plan heading is -0.2 rad in a yaw-0.2 base frame.
        np.testing.assert_allclose(w[:, 2], -0.2, atol=1e-6)
        msgs = ctrl.debug_msgs()
        assert len(msgs["received_global_plan"]["poses"]) == len(w)


class TestSpeedLimit:
    def test_percentage_scales_bounds(self, ctrl):
        ctrl.set_plan(_line_plan())
        base = ctrl.cfg.max_vel_trans
        ctrl.set_speed_limit(50.0, percentage=True)
        assert ctrl.cfg.max_vel_trans == pytest.approx(base * 0.5)
        # Commands respect the new cap.
        vel = np.zeros(3)
        pose = np.zeros(3)
        for _ in range(15):
            cmd = ctrl.compute_velocity_commands(pose, vel, 1 / 30)
            vel = cmd
        assert np.hypot(cmd[0], cmd[1]) <= base * 0.5 + 1e-4

    def test_absolute_limit(self, ctrl):
        ctrl.set_speed_limit(0.35, percentage=False)
        assert ctrl.cfg.max_vel_trans == pytest.approx(0.35)

    def test_repeated_percentage_does_not_compound(self, ctrl):
        base = ctrl.cfg.max_vel_trans
        ctrl.set_speed_limit(50.0, percentage=True)
        ctrl.set_speed_limit(50.0, percentage=True)
        # "percentage from maximum robot speed" — not of the current limit.
        assert ctrl.cfg.max_vel_trans == pytest.approx(base * 0.5)
        ctrl.set_speed_limit(100.0, percentage=True)
        assert ctrl.cfg.max_vel_trans == pytest.approx(base)


class TestNativeGeometry:
    """The C++-geometry controller path must produce the same commands as the
    device-geometry path — the strongest cross-implementation consistency
    check (Layer A in two languages feeding the same solver)."""

    def test_matches_device_geometry(self, cfg, empty_costmap, footprint):
        import subprocess
        from pathlib import Path
        from neo_mpc_planner2_tpu.native.host import NativeHost

        if not NativeHost.available():
            subprocess.run([str(Path(__file__).resolve().parent.parent /
                                "scripts" / "build_native.sh")],
                           check=True, capture_output=True)

        plan = _line_plan()
        from neo_mpc_planner2_tpu.utils.se2_np import integrate_cmd_np

        cmds = {}
        windows = {}
        for native in (False, True):
            c = NeoMpcController()
            c.configure(cfg, costmap=empty_costmap, footprint=footprint,
                        native_geometry=native)
            c.activate()
            c.set_plan(plan)
            pose = np.zeros(3)
            vel = np.zeros(3)
            seq = []
            wins = []
            for _ in range(15):
                cmd = c.compute_velocity_commands(pose, vel, 1 / 30)
                seq.append(cmd)
                wins.append(c.transformed_plan())
                pose = integrate_cmd_np(pose, cmd, 1 / 30)
                vel = cmd
            cmds[native] = np.array(seq)
            windows[native] = wins
        np.testing.assert_allclose(cmds[True], cmds[False], atol=2e-4)
        # The transformed-plan window (received_global_plan) must agree
        # between the C++ host and the device geometry, tick for tick.
        for wn, wd in zip(windows[True], windows[False]):
            assert len(wn) > 0
            assert abs(len(wn) - len(wd)) <= 1  # f32-vs-f64 edge-pose ties
            k = min(len(wn), len(wd))
            np.testing.assert_allclose(wn[:k], wd[:k], atol=2e-4)

    def test_native_lethal_raises(self, cfg, footprint):
        from neo_mpc_planner2_tpu.native.host import NativeHost

        if not NativeHost.available():
            pytest.skip("native lib not built")
        lethal = mpc.Costmap.create(np.ones((40, 40)), origin=(-1.0, -1.0),
                                    resolution=0.05)
        c = NeoMpcController()
        c.configure(cfg, costmap=lethal, footprint=footprint,
                    native_geometry=True)
        c.activate()
        c.set_plan(_line_plan())
        with pytest.raises(ControllerException, match="MPC detected collision"):
            c.compute_velocity_commands([0, 0, 0], [0, 0, 0], 0.033)
