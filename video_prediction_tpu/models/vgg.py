"""VGG-16 feature network for the VGG cosine-similarity metric and the
optional perceptual loss.

Counterpart of the reference's ``video_prediction/models/vgg_network.py``
(``vgg16`` builder + ``vgg_assign_from_values_fn``; weights downloaded as a
checkpoint asset). This environment has no network access and no bundled
VGG weights, so:

- the architecture (conv features of VGG-16, 5 blocks) is implemented here;
- ``load_params_npz`` restores weights from a local ``.npz`` with keys
  ``conv{block}_{idx}/kernel`` (HWIO) and ``.../bias`` — the documented
  import path once weights are obtainable (e.g. converted from the
  torchvision or Keras VGG16 checkpoints);
- ``VGGMetric`` refuses to pretend: without real weights it raises unless
  ``allow_random=True`` (then features come from a fixed random init and
  results are explicitly tagged ``untrained``).

Feature taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 — the standard
perceptual-metric layers (also used by LPIPS).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from video_prediction_tpu.metrics import cosine_similarity

# (block, convs-in-block, channels)
_CFG = [(1, 2, 64), (2, 2, 128), (3, 3, 256), (4, 3, 512), (5, 3, 512)]

# ImageNet normalization (inputs are [0,1] RGB)
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16Features(nn.Module):
    """VGG-16 conv trunk emitting the 5 standard relu taps."""

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        x = (x - _MEAN) / _STD
        taps = []
        for block, n_convs, ch in _CFG:
            for i in range(1, n_convs + 1):
                x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv{block}_{i}")(x)
                x = nn.relu(x)
            taps.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def load_params_npz(path: str) -> Dict:
    """Load VGG16 params from ``.npz`` with ``conv{b}_{i}/kernel|bias`` keys."""
    data = np.load(path)
    params: Dict = {}
    for block, n_convs, _ in _CFG:
        for i in range(1, n_convs + 1):
            name = f"conv{block}_{i}"
            params[name] = {
                "kernel": jnp.asarray(data[f"{name}/kernel"]),
                "bias": jnp.asarray(data[f"{name}/bias"]),
            }
    return {"params": params}


class VGGMetric:
    """VGG cosine similarity between image batches
    (reference ``metrics.py`` VGG cosine distance path).

    ``__call__(a, b) -> [leading dims]`` mean cosine similarity over the
    5 feature taps (spatial-mean pooled, channel cosine).
    """

    def __init__(self, weights_path: Optional[str] = None, allow_random: bool = False):
        self.module = VGG16Features()
        self.untrained = False
        if weights_path and os.path.exists(weights_path):
            self.variables = load_params_npz(weights_path)
        elif allow_random:
            self.variables = self.module.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
            )
            self.untrained = True
        else:
            raise FileNotFoundError(
                "VGG16 weights not found; pass weights_path to a conv{b}_{i}/kernel .npz "
                "or allow_random=True for untrained features (metric values will be "
                "tagged 'untrained' and are NOT comparable to the reference)."
            )
        self._fn = jax.jit(self._csim)

    def _csim(self, a: jax.Array, b: jax.Array) -> jax.Array:
        lead = a.shape[:-3]
        h, w, c = a.shape[-3:]
        fa = self.module.apply(self.variables, a.reshape((-1, h, w, c)))
        fb = self.module.apply(self.variables, b.reshape((-1, h, w, c)))
        sims = []
        for ta, tb in zip(fa, fb):
            # channel-wise cosine at each position, then spatial mean
            sims.append(jnp.mean(cosine_similarity(ta, tb, axis=-1), axis=(-2, -1)))
        out = jnp.mean(jnp.stack(sims, axis=0), axis=0)
        return out.reshape(lead)

    def __call__(self, a, b) -> jax.Array:
        return self._fn(a, b)
