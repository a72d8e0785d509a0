#!/usr/bin/env bash
# Compile the REAL (nav2) branch of the controller plugin shim against the
# stub ROS headers and produce the no-ROS harness binary. The stubs put
# <nav2_core/controller.hpp> etc. on the include path, so the TU's
# __has_include guard selects the real branch — the same code a sourced nav2
# workspace would build via native/ros/CMakeLists.txt.
set -euo pipefail
cd "$(dirname "$0")/.."

ROS=neo_mpc_planner2_tpu/native/ros
OUT=$ROS/stubs_harness
g++ -std=c++17 -Wall -Wextra -O1 -g -I "$ROS/stubs" \
    -I neo_mpc_planner2_tpu/native/src \
    -o "$OUT" "$ROS/stubs_main.cpp" \
    neo_mpc_planner2_tpu/native/src/neo_mpc_host.cpp
echo "built $OUT"
