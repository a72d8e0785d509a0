#!/bin/bash
# Round-4 TPU measurement batch — run when the tunnel is healthy, ONE process
# at a time (single-tenant device; see CLAUDE.md). Produces:
#   1. full bench (headline + NEW rows: dynamic_updates, product_*) @ map 64
#   2. map-128 rows incl. the dynamic decomposition the round-3 verdict
#      demanded (synthesis-only timing at 128 vs the dynamic row)
#   3. quad-interp line-search A/B behind the sweep_ls fidelity gate
# Usage: bash scripts/round4_batch.sh | tee /tmp/r4batch.log
set -x
P="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH=$P:${PYTHONPATH:-}
export NEO_MPC_COMPILE_CACHE=/tmp/neo_xla_cache
cd "$P"

echo "=== 1. full bench, map 64 (new rows live here) ==="
BENCH_DEADLINE_S=1100 timeout 1150 python -u bench.py || true

echo "=== 2. full bench, map 128 / u8 auto (dynamic + updates rows) ==="
BENCH_DEADLINE_S=1100 timeout 1150 python -u bench.py --map-size 128 --costmap-u8 auto || true

echo "=== 3. dynamic decomposition at map 128 (synthesis-only timing) ==="
timeout 600 python -u scripts/dyn_decompose.py --map-size 128 || true
timeout 600 python -u scripts/dyn_decompose.py --map-size 64 || true

echo "=== 4. quad-interp A/B at the cap-8 point (fidelity gated) ==="
timeout 850 python -u scripts/sweep_ls.py --combos 0.5:7:2:0.0625 || true
timeout 850 python -u scripts/sweep_ls.py --combos 0.5:7:2:0.0625 --quad-interp || true

echo "=== done ==="
