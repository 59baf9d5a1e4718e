"""Dataset base classes: TFRecord video pipelines -> numpy batches.

TPU-native counterpart of the reference's ``video_prediction/datasets/
base_dataset.py`` (``BaseVideoDataset`` / ``VideoDataset``): parse ->
decode -> random temporal slice -> normalize -> shuffle/repeat -> batch ->
prefetch. TensorFlow is used CPU-side *only* as a TFRecord reader (same
role as in the reference); arrays cross into JAX as numpy via
``make_iterator`` and are device-put by ``data/loader.py`` with the mesh
sharding (the double-buffered host feed of SURVEY §7).

TF import is lazy so the rest of the framework works without TF installed.
"""

from __future__ import annotations

import glob
import os
import random
import threading
from typing import Any, Dict, Iterator, Optional

import numpy as np

from video_prediction_tpu.configs.hparams import DatasetHparams


def _tf():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    return tf


def _pil_decode(raw) -> np.ndarray:
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))


_DECODE_POOL = None
_DECODE_POOL_SIZE = 0
_DECODE_POOL_LOCK = threading.Lock()


def _decode_pool():
    """Shared frame-decode thread pool for the native backend, sized by
    ``VP_DATA_DECODE_WORKERS`` (0/1 = serial, the default). The native
    JPEG decoder releases the GIL, so N workers scale the decode-bound
    path nearly linearly on an N-core host — the role tf.data's
    ``num_parallel_calls`` plays for the reference pipeline. Correctness
    is covered by a pooled-vs-serial parity test; throughput gains are
    unmeasurable on this 1-core build box."""
    global _DECODE_POOL, _DECODE_POOL_SIZE
    n = int(os.environ.get("VP_DATA_DECODE_WORKERS", "0"))
    if n <= 1:
        return None
    with _DECODE_POOL_LOCK:  # prefetch threads race here; don't leak pools
        if _DECODE_POOL is None or _DECODE_POOL_SIZE != n:
            from concurrent.futures import ThreadPoolExecutor

            if _DECODE_POOL is not None:
                _DECODE_POOL.shutdown(wait=False)
            _DECODE_POOL = ThreadPoolExecutor(n, thread_name_prefix="vp-decode")
            _DECODE_POOL_SIZE = n
        return _DECODE_POOL


class BaseVideoDataset:
    """API mirror of the reference's ``BaseVideoDataset``:
    ``__init__(input_dir, mode, hparams)``, ``make_batch``/``make_iterator``,
    ``num_examples_per_epoch``."""

    # subclasses override
    default_hparams = DatasetHparams()

    def __init__(
        self,
        input_dir: str,
        mode: str = "train",
        hparams: Optional[DatasetHparams] = None,
        seed: Optional[int] = None,
    ):
        self.input_dir = input_dir
        self.mode = mode
        self.hparams = hparams or self.default_hparams
        self.seed = seed

        self.filenames = sorted(
            glob.glob(os.path.join(input_dir, "*.tfrecord*"))
            + glob.glob(os.path.join(input_dir, "*.tfrecords"))
        )

    # ------------------------------------------------------------------ #
    def num_examples_per_epoch(self) -> int:
        """Count records (cached). Reference: per-dataset overrides."""
        if not hasattr(self, "_num_examples"):
            try:
                tf = _tf()
                count = lambda f: sum(1 for _ in tf.data.TFRecordDataset(f))
            except ImportError:
                from video_prediction_tpu import native

                count = lambda f: sum(1 for _ in native.read_records(f))
            self._num_examples = sum(count(f) for f in self.filenames)
        return self._num_examples

    def parser(self, serialized) -> Dict[str, Any]:
        """Parse one serialized example to ``{images [T,H,W,C] float32, ...}``."""
        raise NotImplementedError

    def preprocess_images(self, images):
        """Optional resize/crop (reference ``base_dataset.py#
        decode_and_preprocess_images``): ``crop_size`` center-crops (or pads)
        to a square, then ``scale_size`` bilinear-resizes. Output stays uint8
        so images keep crossing the host->device boundary as bytes.

        Runs on the CPU pipeline host-side — e.g. KTH stored at its native
        120x160 evaluates at 64px with ``scale_size=64`` or 128px with
        ``crop_size=120,scale_size=128``.
        """
        tf = _tf()
        hp = self.hparams
        if hp.crop_size:
            images = tf.image.resize_with_crop_or_pad(images, hp.crop_size, hp.crop_size)
        if hp.scale_size:
            h, w = images.shape[-3], images.shape[-2]
            if h != hp.scale_size or w != hp.scale_size:
                resized = tf.image.resize(images, [hp.scale_size, hp.scale_size], method="bilinear")
                images = tf.cast(tf.round(tf.clip_by_value(resized, 0.0, 255.0)), tf.uint8)
        return images

    @property
    def source_sequence_length(self) -> int:
        """Frames stored per record (the slice window comes from hparams)."""
        raise NotImplementedError

    # ------------------------------------------------------------------ #
    def _slice_sequences(self, example: Dict[str, Any]):
        """CONTIGUOUS temporal window of ``hparams.sequence_length`` frames,
        random start (train) / start 0 (eval) — reference ``slice_sequences``.

        ``time_shift`` quantizes the random start offset to multiples of
        itself (t_start = uniform(0, num_shifts+1) * time_shift with
        num_shifts = (source_len - seq_len) // time_shift); the window
        itself never skips frames. Rounds 1-4 read time_shift as a
        temporal subsample STRIDE, which trains on different (frame-
        skipped) data whenever time_shift > 1 — corrected per the r4
        advisor finding (ADVICE.md); only time_shift = 1 was equivalent.
        Exact value still to be walked against the real reference when
        the mount is populated (SURVEY §0)."""
        tf = _tf()
        hp = self.hparams
        source_len = self.source_sequence_length
        seq_len = hp.sequence_length
        shift = max(hp.time_shift, 1)  # start-offset quantum, NOT a stride
        if seq_len > source_len:
            raise ValueError(
                f"sequence_length {seq_len} > stored length {source_len}"
            )
        num_shifts = (source_len - seq_len) // shift
        if self.mode == "train" and num_shifts > 0:
            off = tf.random.uniform((), 0, num_shifts + 1, dtype=tf.int32) * shift
        else:
            off = 0
        out = {}
        for k, v in example.items():
            out[k] = v[off : off + seq_len]
        return out

    def make_dataset(self, batch_size: int):
        tf = _tf()
        if not self.filenames:
            raise FileNotFoundError(f"no tfrecords under {self.input_dir!r}")
        shuffle = self.mode == "train" or (self.mode == "val" and self.hparams.shuffle_on_val)
        files = list(self.filenames)
        if shuffle:
            random.Random(self.seed).shuffle(files)
        ds = tf.data.TFRecordDataset(files, buffer_size=8 * 1024 * 1024)
        if shuffle:
            ds = ds.apply(tf.data.experimental.shuffle_and_repeat(buffer_size=1024, seed=self.seed))
        else:
            ds = ds.repeat()
        ds = ds.map(
            lambda s: self._slice_sequences(self.parser(s)),
            num_parallel_calls=tf.data.AUTOTUNE,
        )
        ds = ds.batch(batch_size, drop_remainder=True)
        ds = ds.prefetch(tf.data.AUTOTUNE)
        return ds

    # reference name parity
    def make_batch(self, batch_size: int):
        return self.make_dataset(batch_size)

    def _resolve_backend(self, backend: Optional[str]) -> str:
        """tf (default when installed) | native (C++ reader, no TF).
        Resolution: explicit arg > VP_DATA_BACKEND env > auto."""
        backend = backend or os.environ.get("VP_DATA_BACKEND", "")
        if backend in ("tf", "native"):
            return backend
        if backend:
            raise ValueError(f"unknown data backend {backend!r} (want 'tf'|'native')")
        try:
            _tf()
            return "tf"
        except ImportError:
            return "native"

    def make_iterator(
        self, batch_size: int, backend: Optional[str] = None
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite numpy-batch iterator.

        ``backend="native"`` uses the C++ TFRecord reader + numpy pipeline
        (``data/native_loader.py``) instead of tf.data — same batch contract.
        """
        if self._resolve_backend(backend) == "native":
            from video_prediction_tpu.data.native_loader import NativeVideoPipeline

            yield from NativeVideoPipeline(self, batch_size)
            return
        for batch in self.make_dataset(batch_size).as_numpy_iterator():
            yield batch


class VideoDataset(BaseVideoDataset):
    """TFRecord datasets with per-frame feature keys like
    ``"%d/image_aux1/encoded"`` (the BAIR/softmotion family layout).

    Subclasses configure class attrs instead of rewriting the parser —
    the single choke point the reference spreads across per-dataset files.
    """

    # class attrs overridden by subclasses
    IMAGE_KEY = "%d/image_aux1/encoded"
    IMAGE_SHAPE = (64, 64, 3)  # H, W, C
    IMAGE_ENCODING = "raw"  # raw | jpeg | png
    ACTION_KEY: Optional[str] = "%d/action"
    ACTION_DIM = 4
    STATE_KEY: Optional[str] = "%d/endeffector_pos"
    STATE_DIM = 3
    SOURCE_SEQUENCE_LENGTH = 30

    @property
    def source_sequence_length(self) -> int:
        return self.SOURCE_SEQUENCE_LENGTH

    def parser(self, serialized):
        tf = _tf()
        T = self.SOURCE_SEQUENCE_LENGTH
        h, w, c = self.IMAGE_SHAPE
        features: Dict[str, Any] = {}
        for i in range(T):
            features[self.IMAGE_KEY % i] = tf.io.FixedLenFeature([], tf.string)
            if self.ACTION_KEY and self.hparams.use_state:
                features[self.ACTION_KEY % i] = tf.io.FixedLenFeature([self.ACTION_DIM], tf.float32)
            if self.STATE_KEY and self.hparams.use_state:
                features[self.STATE_KEY % i] = tf.io.FixedLenFeature([self.STATE_DIM], tf.float32)
        parsed = tf.io.parse_single_example(serialized, features)

        # with crop/scale preprocessing active, encoded frames may be stored
        # at a different (even unknown) native resolution: decode dynamically
        # and let preprocess_images produce the static final size
        dynamic = bool(self.hparams.crop_size or self.hparams.scale_size)
        frames = []
        for i in range(T):
            raw = parsed[self.IMAGE_KEY % i]
            if self.IMAGE_ENCODING == "raw":
                img = tf.reshape(tf.io.decode_raw(raw, tf.uint8), [h, w, c])
            elif self.IMAGE_ENCODING in ("jpeg", "png"):
                img = tf.image.decode_image(raw, channels=c, expand_animations=False)
                if dynamic:
                    img.set_shape([None, None, c])
                else:
                    img = tf.reshape(img, [h, w, c])
            else:
                raise ValueError(self.IMAGE_ENCODING)
            frames.append(img)
        # images stay uint8 across the host->device boundary (4x less wire
        # traffic than f32 — decisive over a tunneled TPU link); the jitted
        # step normalizes on device (models/base.py#images_to_float)
        images = self.preprocess_images(tf.stack(frames))
        out = {"images": images}
        if self.ACTION_KEY and self.hparams.use_state:
            out["actions"] = tf.stack([parsed[self.ACTION_KEY % i] for i in range(T)])
        if self.STATE_KEY and self.hparams.use_state:
            out["states"] = tf.stack([parsed[self.STATE_KEY % i] for i in range(T)])
        return out

    def parse_example_np(
        self, feats: Dict[str, Any], time_indices=None
    ) -> Dict[str, np.ndarray]:
        """TF-free counterpart of ``parser``: consume the feature dict from
        ``native.parse_example`` / ``native.iter_examples`` and produce the
        same ``{images uint8 [T,H,W,C], actions?, states?}`` contract, with
        crop/scale preprocessing done in numpy (``data/native_loader.py``).

        ``time_indices`` selects which stored frames to materialize (the
        loader passes the random temporal window here, so only the sliced
        frames are JPEG-decoded/copied — 2.5x fewer decodes at the zoo's
        sequence_length 12 of 30 stored frames); default all frames.
        """
        if time_indices is None:
            time_indices = range(self.SOURCE_SEQUENCE_LENGTH)
        hp = self.hparams
        # strict exactly-one unpack: a record with several byte payloads
        # under one frame key is malformed and must raise, not silently
        # train on the first payload
        raws = []
        for i in time_indices:
            (raw,) = feats[self.IMAGE_KEY % i]
            raws.append(raw)
        out = {"images": self._materialize_images(raws)}
        if self.ACTION_KEY and hp.use_state:
            out["actions"] = np.stack(
                [feats[self.ACTION_KEY % i] for i in time_indices]
            ).astype(np.float32)
        if self.STATE_KEY and hp.use_state:
            out["states"] = np.stack(
                [feats[self.STATE_KEY % i] for i in time_indices]
            ).astype(np.float32)
        return out

    def _materialize_images(self, raws) -> np.ndarray:
        """Decode a list of per-frame payloads and apply crop/scale — the
        single implementation both native parse paths share."""
        from video_prediction_tpu.data.native_loader import (
            bilinear_resize_uint8,
            center_crop_or_pad,
        )

        h, w, c = self.IMAGE_SHAPE
        hp = self.hparams
        if self.IMAGE_ENCODING == "raw":
            decode = lambda raw: np.frombuffer(raw, np.uint8).reshape(h, w, c)
        elif self.IMAGE_ENCODING == "jpeg":
            from video_prediction_tpu import native

            if native.codec_available():
                decode = native.decode_jpeg  # C++ libjpeg, no PIL
            else:  # pragma: no cover - fallback when libjpeg is absent
                decode = _pil_decode
        elif self.IMAGE_ENCODING == "png":
            decode = _pil_decode
        else:
            raise ValueError(self.IMAGE_ENCODING)
        pool = _decode_pool()
        # the C decoder releases the GIL, so a thread pool scales the
        # dominant JPEG-decode cost across host cores (the role tf.data's
        # num_parallel_calls plays for the reference); serial by default
        frames = list(pool.map(decode, raws)) if pool else [decode(r) for r in raws]
        images = np.stack(frames)
        if hp.crop_size:
            images = center_crop_or_pad(images, hp.crop_size)
        if hp.scale_size and images.shape[1:3] != (hp.scale_size, hp.scale_size):
            images = bilinear_resize_uint8(images, hp.scale_size, hp.scale_size)
        return images

    # ---- native gather fast path -------------------------------------- #
    def gather_plan(self):
        """Ordered key request for ``native.iter_gathered`` (cached):
        ``(keys, has_actions, has_states)`` — images keys first (one per
        stored frame), then per-frame actions, then states."""
        if getattr(self, "_gather_plan_cache", None) is None:
            T = self.SOURCE_SEQUENCE_LENGTH
            hp = self.hparams
            keys = [self.IMAGE_KEY % i for i in range(T)]
            has_a = bool(self.ACTION_KEY and hp.use_state)
            has_s = bool(self.STATE_KEY and hp.use_state)
            if has_a:
                keys += [self.ACTION_KEY % i for i in range(T)]
            if has_s:
                keys += [self.STATE_KEY % i for i in range(T)]
            self._gather_plan_cache = (keys, has_a, has_s)
        return self._gather_plan_cache

    def parse_gathered_np(self, g, time_indices=None) -> Dict[str, np.ndarray]:
        """Consume one ``native.GatheredExample`` for :meth:`gather_plan`'s
        request — the data-plane hot path: no per-feature dict, key
        matching already done in C++. Same contract and preprocessing as
        :meth:`parse_example_np`."""
        T = self.SOURCE_SEQUENCE_LENGTH
        if time_indices is None:
            time_indices = range(T)
        _, has_a, has_s = self.gather_plan()
        nvals = g.nvals
        types = g.types
        if not (types[:T] == 0).all() or not (nvals[:T] == 1).all():
            raise ValueError(
                "malformed record: every stored frame key must hold exactly "
                "one bytes payload"
            )
        # request order puts image payloads first, one per frame
        out = {"images": self._materialize_images([g.byte_values[i] for i in time_indices])}
        idx = list(time_indices)
        fpos = 0
        if has_a:
            na = int(nvals[T : 2 * T].sum())
            out["actions"] = g.floats[:na].reshape(T, -1)[idx].astype(np.float32)
            fpos = na
        if has_s:
            s0 = 2 * T if has_a else T
            ns = int(nvals[s0 : s0 + T].sum())
            out["states"] = (
                g.floats[fpos : fpos + ns].reshape(T, -1)[idx].astype(np.float32)
            )
        return out
