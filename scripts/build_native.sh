#!/usr/bin/env bash
# Build the native host front-end (neo_mpc_planner2_tpu/native/libneo_mpc_host.so).
# Debug/sanitizer builds: BUILD_FLAVOR=asan|ubsan|tsan ./scripts/build_native.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SRC=neo_mpc_planner2_tpu/native/src/neo_mpc_host.cpp
OUT=neo_mpc_planner2_tpu/native/libneo_mpc_host.so
FLAVOR="${BUILD_FLAVOR:-release}"

case "$FLAVOR" in
  release) FLAGS="-O3 -DNDEBUG" ;;
  asan)    FLAGS="-O1 -g -fsanitize=address -fno-omit-frame-pointer"; OUT=${OUT%.so}_asan.so ;;
  ubsan)   FLAGS="-O1 -g -fsanitize=undefined -fno-omit-frame-pointer"; OUT=${OUT%.so}_ubsan.so ;;
  tsan)    FLAGS="-O1 -g -fsanitize=thread -fno-omit-frame-pointer"; OUT=${OUT%.so}_tsan.so ;;
  *) echo "unknown BUILD_FLAVOR=$FLAVOR" >&2; exit 2 ;;
esac

g++ -std=c++17 -shared -fPIC -Wall -Wextra $FLAGS -o "$OUT" "$SRC"
echo "built $OUT"

# Pure-C++ test binary (no Python): links the host sources directly.
TEST_BIN=neo_mpc_planner2_tpu/native/host_test
g++ -std=c++17 -Wall -Wextra $FLAGS -o "$TEST_BIN" \
    neo_mpc_planner2_tpu/native/src/host_test_main.cpp "$SRC"
echo "built $TEST_BIN"

# nav2 plugin shim: syntax-check the compile guard (without nav2 headers the
# TU compiles empty; with a sourced nav2 workspace build the real plugin via
# neo_mpc_planner2_tpu/native/ros/CMakeLists.txt instead).
PLUGIN_SRC=neo_mpc_planner2_tpu/native/src/neo_mpc_nav2_plugin.cpp
PLUGIN_OBJ=$(mktemp /tmp/neo_mpc_nav2_plugin.XXXXXX.o)
g++ -std=c++17 -Wall -Wextra $FLAGS -c -o "$PLUGIN_OBJ" "$PLUGIN_SRC"
rm -f "$PLUGIN_OBJ"
echo "checked $PLUGIN_SRC (nav2 guard branch)"
