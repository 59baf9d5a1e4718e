#!/usr/bin/env bash
# Evaluate every trained run under a runs root (reference `*_all.sh` drivers).
# Usage: evaluate_all.sh <runs_root/dataset> <test_input_dir> <results_dir> [extra evaluate.py flags...]
set -euo pipefail
RUNS=${1:?usage: $0 <runs_root/dataset> <test_input_dir> <results_dir> [flags...]}
INPUT_DIR=${2?missing input_dir (may be empty: "")}
RESULTS=${3:?}
shift 3
REPO="$(cd "$(dirname "$0")/.." && pwd)"
for run in "$RUNS"/*/; do
  [ -f "$run/options.json" ] || continue
  echo "=== evaluating $run ==="
  python "$REPO/scripts/evaluate.py" --checkpoint "$run" --input_dir "$INPUT_DIR" \
    --results_dir "$RESULTS" "$@"
done
