"""Synthetic moving-shapes video dataset (no files required).

Not present in the reference (which ships download scripts instead); this
fills the same role for tests, benchmarks, and demos without network
access: deterministic procedurally-generated sequences of bouncing squares
with action conditioning (action = velocity delta), BAIR-shaped
(``images [T,64,64,3]``, ``actions [T,4]``, ``states [T,3]``).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from video_prediction_tpu.configs.hparams import DatasetHparams


class SyntheticVideoDataset:
    """Bouncing-squares generator with the ``BaseVideoDataset`` iterator API."""

    default_hparams = DatasetHparams(context_frames=2, sequence_length=12)

    def __init__(
        self,
        input_dir: str = "",
        mode: str = "train",
        hparams: Optional[DatasetHparams] = None,
        seed: Optional[int] = None,
        image_size: int = 64,
        num_shapes: int = 3,
    ):
        self.mode = mode
        self.hparams = hparams or self.default_hparams
        self.image_size = image_size
        self.num_shapes = num_shapes
        base_seed = (seed if seed is not None else 0) + {"train": 0, "val": 10_000, "test": 20_000}.get(mode, 0)
        self._rng = np.random.RandomState(base_seed)

    def num_examples_per_epoch(self) -> int:
        return 256

    def _sequence(self) -> Dict[str, np.ndarray]:
        hp = self.hparams
        T = hp.sequence_length
        S = self.image_size
        rng = self._rng
        img = np.zeros((T, S, S, 3), np.float32)
        pos = rng.uniform(S * 0.2, S * 0.8, (self.num_shapes, 2))
        vel = rng.uniform(-2.5, 2.5, (self.num_shapes, 2))
        sizes = rng.randint(S // 10, S // 5, self.num_shapes)
        colors = rng.uniform(0.4, 1.0, (self.num_shapes, 3))
        actions = np.zeros((T, 4), np.float32)
        states = np.zeros((T, 3), np.float32)
        for t in range(T):
            for s in range(self.num_shapes):
                y, x = pos[s]
                half = sizes[s] // 2
                y0, y1 = int(max(0, y - half)), int(min(S, y + half))
                x0, x1 = int(max(0, x - half)), int(min(S, x + half))
                img[t, y0:y1, x0:x1] = np.maximum(img[t, y0:y1, x0:x1], colors[s])
                pos[s] += vel[s]
                for d in range(2):
                    if pos[s, d] < half or pos[s, d] > S - half:
                        vel[s, d] *= -1.0
                        pos[s, d] = np.clip(pos[s, d], half, S - half)
            actions[t, :2] = vel[0]
            states[t, :2] = pos[0] / S
        return {"images": img, "actions": actions, "states": states}

    def make_iterator(self, batch_size: int) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            seqs = [self._sequence() for _ in range(batch_size)]
            yield {k: np.stack([s[k] for s in seqs]) for k in seqs[0]}

    def make_batch(self, batch_size: int):
        return self.make_iterator(batch_size)
