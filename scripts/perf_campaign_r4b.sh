#!/bin/bash
# Round-4 perf campaign phase B: explore around the phase-A winner
# (batch 64, unroll 0, merged gates, bf16 gate math = 1152 f/s/chip).
set -u
cd /root/repo
LOG=${1:-/tmp/perf_campaign_r4b.log}
echo "=== perf campaign r4b start $(date -u +%FT%TZ) ===" >> "$LOG"
run() {
  echo "--- probe: $* ($(date -u +%T)) ---" >> "$LOG"
  timeout 2700 python scripts/bench_probe.py "$@" >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
}
# gate-layout A/B at the new winner
run --batch 64 --unroll 0 --gate split --gate_dtype bfloat16
# batch scaling of the winning regime: does 96 fit? 128?
run --batch 96 --unroll 0 --gate merged --gate_dtype bfloat16
run --batch 128 --unroll 0 --gate merged --gate_dtype bfloat16
echo "=== perf campaign r4b done $(date -u +%FT%TZ) ===" >> "$LOG"
