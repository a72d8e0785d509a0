#!/bin/bash
# Round-3 TPU measurement batch — run as ONE process chain (the tunnel is
# single-tenant). Usage: bash scripts/round3_batch.sh | tee /tmp/r3batch.log
set -u
P=/root/repo
export PYTHONPATH=$P:${PYTHONPATH:-}
export NEO_MPC_COMPILE_CACHE=/tmp/neo_xla_cache
cd "$P"

run() { echo "=== $* ==="; timeout "$@" 2>&1 | grep -v WARNING; echo "--- exit=$? ---"; }

# 1. Gather-formulation probes (u8/bf16/map-128 sensitivity).
run 500 python -u scripts/gather_bench.py

# 2. Cap-7 operating point: throughput + fidelity gate.
run 850 python -u scripts/sweep_ls.py --max-iters 7 --combos 0.5:7:2:0.0625

# 3. Compaction re-sweep at cap 8 with the round-3 kernels.
run 850 python -u scripts/sweep_compact.py --max-iters 8 --pairs 4:0.0625 5:0.0625 4:0.125

# 4. Wave-2 line search (untested width; wave-4 lost in round 2).
run 700 python -u scripts/sweep_compact.py --max-iters 8 --ls-wave 2 --pairs 4:0.0625

# 5. Batch-scaling table refresh.
for b in 1024 2048 8192 16384; do
  run 700 python -u scripts/sweep_ls.py --no-fidelity --batch "$b" --combos 0.5:7:2:0.0625
done

# 6. Map-128 robustness point.
run 700 python -u scripts/sweep_ls.py --no-fidelity --map-size 128 --combos 0.5:7:2:0.0625
