#!/usr/bin/env bash
# Native-layer sanity: build the host library under ASan + UBSan and drive it
# through the ctypes bindings (SURVEY.md §5 race-detection/sanitizers row —
# the reference has no sanitizer coverage; its param callback even self-locks,
# cpp:339+352).
set -euo pipefail
cd "$(dirname "$0")/.."

# Pure-C++ test binary first (release flags).
./scripts/build_native.sh >/dev/null
./neo_mpc_planner2_tpu/native/host_test

# nav2 plugin shim: compile the REAL branch against the stub ROS headers
# (run end-to-end by tests/test_nav2_plugin.py; here just the build).
./scripts/check_nav2_plugin.sh >/dev/null
echo "nav2 plugin stub-harness build ok"

# TSan: the test binary's concurrent reconfigure-vs-tick section exercises
# every mutex path (the reference's param callback self-deadlocks there,
# SURVEY §2.3.4). Pure C++ — no CPython under TSan.
BUILD_FLAVOR=tsan ./scripts/build_native.sh >/dev/null
./neo_mpc_planner2_tpu/native/host_test
echo "tsan run ok"

# Rebuild release so later stages (and the repo) keep the fast binary.
./scripts/build_native.sh >/dev/null

for flavor in asan ubsan; do
  BUILD_FLAVOR=$flavor ./scripts/build_native.sh
  LIB="neo_mpc_planner2_tpu/native/libneo_mpc_host_${flavor}.so"
  PRELOAD=""
  if [ "$flavor" = asan ]; then
    PRELOAD=$(gcc -print-file-name=libasan.so)
  fi
  # Leak detection off: CPython's own import-time allocations dominate and
  # our library owns no allocations beyond the create/destroy pair (exercised
  # below). ASan still catches overflow/UAF/etc.
  ASAN_OPTIONS=detect_leaks=0 LD_PRELOAD="$PRELOAD" NEO_MPC_HOST_LIB="$LIB" python - <<'EOF'
import ctypes, os
import numpy as np

# Point the bindings at the sanitized library.
import neo_mpc_planner2_tpu.native.host as H
H._LIB_PATH = os.environ["NEO_MPC_HOST_LIB"]

host = H.NativeHost(lookahead_dist_min=0.4, lookahead_dist_max=0.4,
                    lookahead_dist_close_to_goal=0.4, controller_frequency=30.0)
plan = np.stack([np.linspace(0, 2, 50), np.zeros(50), np.zeros(50)], 1)
host.set_plan(plan)
cm = np.zeros((40, 40), np.float32)
fp = np.array([[0.3, 0.2], [-0.3, 0.2], [-0.3, -0.2], [0.3, -0.2]])
for i in range(200):
    pose = [0.003 * i, 0.0, 0.01 * i]  # stays inside the 2 m map
    status, req = host.tick(pose, [0.3, 0, 0], cm, (-1, -1), 0.05, fp)
    assert status in (0, 2), status
# footprint hanging off the map edge: out-of-bounds cells are lethal
status, _ = host.tick([0.9, 0.0, 0.0], [0, 0, 0], cm, (-1, -1), 0.05, fp)
assert status == 3, status
# far off-map: the plan window is empty before the footprint check
status, _ = host.tick([5.0, 5.0, 0.0], [0, 0, 0], cm, (-1, -1), 0.05, fp)
assert status == 2, status
# degenerate inputs
host.set_plan(plan[:1])
host.tick([0, 0, 0], [0, 0, 0], cm, (-1, -1), 0.05, fp[:0])
host.footprint_cost(cm, (-1, -1), 0.05, fp, [10.0, 10.0, 0.0])
print(f"sanitized run ok: {os.path.basename(os.environ['NEO_MPC_HOST_LIB'])}")
EOF
done
echo "native sanitizer checks passed"
