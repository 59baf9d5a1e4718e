"""LPIPS learned perceptual metric (Zhang et al. 2018).

Counterpart of the reference's ``lpips-tensorflow`` git submodule hook
(``metrics.py`` LPIPS path). The VGG-variant LPIPS is: unit-normalize the
channel activations of the 5 VGG16 relu taps for both images, take squared
differences, apply a learned 1x1 linear (non-negative) weighting per layer,
and average spatially + across layers.

Weights: requires (a) VGG16 conv weights (see ``models/vgg.py``) and (b)
the LPIPS linear weights as an ``.npz`` with keys ``lin{0..4}/weight``
(shape ``[C_l]``). Both are unavailable in this zero-egress build, so
``LPIPSMetric`` is gated the same way as ``VGGMetric`` — construct it with
paths once the assets exist, or ``allow_random=True`` for plumbing tests
(results tagged ``untrained``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_prediction_tpu.models.vgg import VGG16Features, load_params_npz

_TAP_CHANNELS = [64, 128, 256, 512, 512]


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)


class LPIPSMetric:
    """``__call__(a, b) -> [leading dims]`` LPIPS distance (lower = closer)."""

    def __init__(
        self,
        vgg_weights_path: Optional[str] = None,
        lin_weights_path: Optional[str] = None,
        allow_random: bool = False,
    ):
        self.module = VGG16Features()
        self.untrained = False
        if vgg_weights_path and os.path.exists(vgg_weights_path):
            self.variables = load_params_npz(vgg_weights_path)
        elif allow_random:
            self.variables = self.module.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
            )
            self.untrained = True
        else:
            raise FileNotFoundError(
                "LPIPS needs VGG16 weights (.npz); see models/vgg.py docstring, or pass allow_random=True."
            )
        if lin_weights_path and os.path.exists(lin_weights_path):
            data = np.load(lin_weights_path)
            self.lins = [jnp.asarray(data[f"lin{i}/weight"]) for i in range(5)]
        elif allow_random or self.untrained:
            self.lins = [jnp.ones((c,), jnp.float32) / c for c in _TAP_CHANNELS]
            self.untrained = True
        else:
            raise FileNotFoundError("LPIPS linear weights (.npz with lin{i}/weight) not found.")
        self._fn = jax.jit(self._distance)

    def _distance(self, a: jax.Array, b: jax.Array) -> jax.Array:
        lead = a.shape[:-3]
        h, w, c = a.shape[-3:]
        fa = self.module.apply(self.variables, a.reshape((-1, h, w, c)))
        fb = self.module.apply(self.variables, b.reshape((-1, h, w, c)))
        total = 0.0
        for ta, tb, lin in zip(fa, fb, self.lins):
            diff = jnp.square(_unit_normalize(ta) - _unit_normalize(tb))  # [N,h,w,C]
            weighted = jnp.sum(diff * jnp.maximum(lin, 0.0), axis=-1)  # 1x1 conv
            total = total + jnp.mean(weighted, axis=(-2, -1))
        return total.reshape(lead)

    def __call__(self, a, b) -> jax.Array:
        return self._fn(a, b)
