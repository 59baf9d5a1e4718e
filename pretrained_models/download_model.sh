#!/usr/bin/env bash
# Counterpart of the reference's pretrained_models/download_model.sh.
# The reference hosts TF1 checkpoints (not loadable here); this framework's
# checkpoints are orbax directories produced by scripts/train.py. Publish
# trained runs by copying <output_dir>/checkpoints and the three JSON
# option files; restore with scripts/evaluate.py --checkpoint <output_dir>.
echo "No hosted checkpoints in this zero-egress build; see header comment." >&2
exit 1
