#!/bin/bash
# Round-4 perf campaign (VERDICT Next #1): settle the >=5x question at the
# efficient operating points with measurements. Runs bench_probe.py once
# per lever, sequentially (ONE TPU process at a time), appending rows to
# the log. Probes ordered most-valuable-first so a dead tunnel still
# yields the key rows. OOMs/compile failures are informative rows too —
# stderr is captured.
set -u
cd /root/repo
LOG=${1:-/tmp/perf_campaign_r4.log}
echo "=== perf campaign r4 start $(date -u +%FT%TZ) ===" >> "$LOG"
run() {
  echo "--- probe: $* ($(date -u +%T)) ---" >> "$LOG"
  timeout 2700 python scripts/bench_probe.py "$@" >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
}
# 1. THE potential step-change: does bf16 gate math make the fast CSE'd
#    full-unroll regime FIT at batch 64 (f32 gate temps dominated the OOM)?
run --batch 64 --unroll 0 --gate merged --gate_dtype bfloat16
# 2. batch-48 full unroll (extrapolated ~12.5G, never compiled)
run --batch 48 --unroll 0 --gate merged
# 3. bf16 gates at the headline point (A/B vs 253 ms fp32)
run --batch 16 --unroll 0 --gate merged --gate_dtype bfloat16
# 4. bf16 gates at the current batch-64 best (unroll 6 split, 897 f/s)
run --batch 64 --unroll 6 --gate split --gate_dtype bfloat16
# 5. memory-bounded full unroll at 64 (prevent_cse, recompute returns)
run --batch 64 --unroll 0 --gate split --prevent_cse
run --batch 64 --unroll 0 --gate merged --prevent_cse
# 6. batch-32 bf16 gates
run --batch 32 --unroll 0 --gate merged --gate_dtype bfloat16
# 7. batch-48 full unroll + bf16 gates
run --batch 48 --unroll 0 --gate merged --gate_dtype bfloat16
# 8. batch 128 rolled, both gate dtypes
run --batch 128 --unroll 6 --gate split
run --batch 128 --unroll 6 --gate split --gate_dtype bfloat16
echo "=== perf campaign r4 done $(date -u +%FT%TZ) ===" >> "$LOG"
