#!/usr/bin/env bash
# Dataset fetch + preprocess driver.
# Counterpart of the reference's data/download_and_preprocess_dataset.sh.
# Usage: download_and_preprocess_dataset.sh <bair|kth|something> <out_dir>
#
# NOTE: this build environment has no network egress; these scripts document
# the same sources the reference uses and work in a connected environment.
set -euo pipefail

DATASET=${1:?usage: $0 <bair|kth|something> <out_dir>}
OUT=${2:?usage: $0 <bair|kth|something> <out_dir>}
mkdir -p "$OUT"

case "$DATASET" in
  bair)
    # BAIR robot pushing (softmotion30_44k), ~30GB of TFRecords.
    URL="http://rail.eecs.berkeley.edu/datasets/bair_robot_pushing_dataset_v0.tar"
    echo "downloading $URL"
    curl -L "$URL" -o "$OUT/bair.tar"
    tar -xvf "$OUT/bair.tar" -C "$OUT" && rm "$OUT/bair.tar"
    # records land in $OUT/softmotion30_44k/{train,test}; ready for --input_dir
    ;;
  kth)
    # KTH human actions: 6 action classes, 25 persons, .avi videos.
    BASE="http://www.nada.kth.se/cvap/actions"
    for action in walking jogging running boxing handwaving handclapping; do
      echo "downloading $action"
      curl -L "$BASE/${action}.zip" -o "$OUT/${action}.zip"
      unzip -o "$OUT/${action}.zip" -d "$OUT/raw/$action" && rm "$OUT/${action}.zip"
    done
    echo "extract frames (requires ffmpeg or PIL-compatible extraction), then:"
    echo "python -m video_prediction_tpu.data.kth $OUT/frames $OUT/tfrecords"
    ;;
  something)
    # 20BN Something-Something requires a registration-gated download from
    # https://www.qualcomm.com/developer/software/something-something-v-2-dataset
    # (v1 was 20bn.com). After extracting the per-video frame directories:
    echo "Something-Something is registration-gated; download the archive from"
    echo "the 20BN/Qualcomm site, extract frames to $OUT/frames/<video_id>/, then:"
    echo "python -m video_prediction_tpu.data.something $OUT/frames $OUT/tfrecords"
    ;;
  *)
    echo "unknown dataset: $DATASET" >&2; exit 1;;
esac
