#!/usr/bin/env bash
# Round-5 TPU measurement batch (run steps individually on slow-tunnel days;
# every step shares the persistent XLA compile cache so re-runs stay warm).
# One python process at a time — the tunneled TPU is single-tenant.
set -uo pipefail
cd "$(dirname "$0")/.."
export NEO_MPC_COMPILE_CACHE=/tmp/neo_xla_cache

run() { echo "=== $* ==="; timeout "$1" "${@:2}"; echo "rc=$?"; }

# 1. Full bench with the round-5 rows (product-SQP pass, default-preset
#    batch-1 latency, blocked-frac classification).
run 590 python -u bench.py

# 2. Robustness point: map-128 u8 (adds the product blocked-frac at 128).
run 590 python -u bench.py --map-size 128 --costmap-u8 true

# 3. Batch-1 device-step trace A/B: quad-interp on (the fleet preset that
#    regressed device_p99 0.308 -> 0.894) vs off (the default preset).
run 420 python scripts/trace_headline.py --step-mode --batch 1 --reps 12
run 420 python scripts/trace_headline.py --step-mode --batch 1 --reps 12 \
    --quad-interp

# 4. Quad-interp batch envelope: throughput A/B at 8192 and 16384
#    (fleet line-search combo; fidelity studied at 4096 in round 4).
for B in 8192 16384; do
  run 560 python scripts/sweep_ls.py --batch "$B" --ticks 10 \
      --combos 0.5:7:2:0.0625 --no-fidelity
  run 560 python scripts/sweep_ls.py --batch "$B" --ticks 10 \
      --combos 0.5:7:2:0.0625 --no-fidelity --quad-interp
done

# 5. Product map-128 quality attribution (content vs grid vs cap).
run 1200 python scripts/product_decompose.py --batch 4096 --ticks 20 \
    --quality-ticks 160

# 6. Long-horizon sequence parity: T=50, merged into the committed report.
run 3000 python scripts/parity_study.py --suites sequence \
    --sequence-n 20 --sequence-ticks 50 --append --out PARITY_REPORT.json
