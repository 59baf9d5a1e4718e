"""Something-Something (20BN) dataset + webm/frames -> TFRecord converter.

The BASELINE.json north star names "TFRecord video datasets (BAIR push,
KTH, Something-Something)" and its configs[4] is "Something-Something full
SAVP, multi-chip data-parallel with VGG-cosine eval"; the SAVP line of work
uses the 20BN Something-Something v1/v2 crowd-acted object-interaction
clips as its hardest action-free benchmark. (The dataset was a SURVEY.md
blind spot — no reference file anchor exists; the schema here follows this
repo's KTH/UCF-101 converter convention: per-frame JPEG under
``%d/image/encoded`` with fixed-length windows, so variable-length source
videos become uniform records.)

Clips are action-free (the label is a text template, not a control signal):
no action/state features, like KTH.

Converter: ``python -m video_prediction_tpu.data.something <frames_root>
<out_dir>`` where ``frames_root/<video_id>/*.jpg`` are pre-extracted frames
(the 20BN v1 distribution ships exactly that layout; for v2 webm files,
extract frames first — this env has no ffmpeg, see data_scripts/). Frames
are center-cropped to square then resized, preserving aspect ratio the way
the SAVP preprocessing does for non-square sources.
"""

from __future__ import annotations

import glob
import io
import os
from typing import List, Sequence, Tuple

from video_prediction_tpu.configs.hparams import DatasetHparams
from video_prediction_tpu.data.base import VideoDataset, _tf


class SomethingSomethingVideoDataset(VideoDataset):
    """20BN Something-Something clips as fixed-window JPEG records."""

    IMAGE_KEY = "%d/image/encoded"
    IMAGE_SHAPE = (64, 64, 3)
    IMAGE_ENCODING = "jpeg"
    ACTION_KEY = None
    STATE_KEY = None
    SOURCE_SEQUENCE_LENGTH = 16  # converter window (clips are ~30-50 frames at 12 fps)

    default_hparams = DatasetHparams(
        context_frames=2,
        sequence_length=12,
        long_sequence_length=16,
        use_state=False,
    )


# ---------------------------------------------------------------------- #
# converter
# ---------------------------------------------------------------------- #


def _load_square(path: str, size: int):
    """Center-crop to square, then resize (uint8 PIL image)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    side = min(w, h)
    left, top = (w - side) // 2, (h - side) // 2
    img = img.crop((left, top, left + side, top + side))
    return img.resize((size, size))


def save_tf_record(
    out_path: str,
    video_dirs: Sequence[str],
    window: int = 16,
    size: int = 64,
    stride: int | None = None,
) -> int:
    """Write fixed-length JPEG windows from each clip's frame directory."""
    tf = _tf()
    stride = stride or window
    count = 0
    with tf.io.TFRecordWriter(out_path) as writer:
        for vdir in video_dirs:
            frames = sorted(
                glob.glob(os.path.join(vdir, "*.jpg"))
                + glob.glob(os.path.join(vdir, "*.jpeg"))
                + glob.glob(os.path.join(vdir, "*.png"))
            )
            for start in range(0, len(frames) - window + 1, stride):
                feat = {}
                for i in range(window):
                    buf = io.BytesIO()
                    _load_square(frames[start + i], size).save(buf, format="JPEG", quality=95)
                    feat[f"{i}/image/encoded"] = tf.train.Feature(
                        bytes_list=tf.train.BytesList(value=[buf.getvalue()])
                    )
                feat["sequence_length"] = tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[window])
                )
                ex = tf.train.Example(features=tf.train.Features(feature=feat))
                writer.write(ex.SerializeToString())
                count += 1
    return count


def partition_data(video_dirs: List[str], val_fraction: float = 0.02):
    """Deterministic train/val split by video id (the official 20BN split
    lists live in JSON label files we may not have offline; a stable
    id-ordered tail split keeps the converter self-contained)."""
    n_val = max(1, int(len(video_dirs) * val_fraction)) if val_fraction > 0 else 0
    return video_dirs[n_val:], video_dirs[:n_val]


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("frames_root", help="dir of <video_id>/<frame>.jpg trees")
    p.add_argument("out_dir")
    p.add_argument("--window", type=int, default=16)
    p.add_argument("--stride", type=int, default=0, help="0 -> window (non-overlapping)")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--val_fraction", type=float, default=0.02)
    args = p.parse_args()

    video_dirs = sorted(
        d for d in glob.glob(os.path.join(args.frames_root, "*")) if os.path.isdir(d)
    )
    if not video_dirs:
        raise FileNotFoundError(f"no video dirs under {args.frames_root!r}")
    train, val = partition_data(video_dirs, args.val_fraction)
    os.makedirs(os.path.join(args.out_dir, "train"), exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "val"), exist_ok=True)
    n1 = save_tf_record(
        os.path.join(args.out_dir, "train", "something_train.tfrecord"),
        train, args.window, args.image_size, args.stride or None,
    )
    n2 = save_tf_record(
        os.path.join(args.out_dir, "val", "something_val.tfrecord"),
        val, args.window, args.image_size, args.stride or None,
    )
    print(f"wrote {n1} train / {n2} val sequences")


if __name__ == "__main__":
    main()
