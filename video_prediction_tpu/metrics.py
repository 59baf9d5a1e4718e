"""Per-frame evaluation metrics: MSE, PSNR, SSIM (TF-compatible), cosine sim.

TPU-native counterpart of the reference's ``video_prediction/metrics.py``.
SSIM reproduces ``tf.image.ssim`` semantics — 11x11 Gaussian window
(sigma 1.5), k1=0.01, k2=0.03, VALID padding, channel-averaged — so eval
curves are comparable with the TF1 reference. All functions accept
``[..., H, W, C]`` and reduce over the trailing image dims only, preserving
leading (batch, time) dims for the per-frame curves that ``evaluate.py``
emits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _f32(x):
    return x.astype(jnp.float32)


def mean_squared_error(true: jax.Array, pred: jax.Array) -> jax.Array:
    """Per-image MSE over (H, W, C). Reference ``metrics.py#mean_squared_error``."""
    return jnp.mean(jnp.square(_f32(true) - _f32(pred)), axis=(-3, -2, -1))


def peak_signal_to_noise_ratio(true: jax.Array, pred: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Per-image PSNR in dB. Reference ``metrics.py#peak_signal_to_noise_ratio``."""
    mse = mean_squared_error(true, pred)
    return 10.0 * (jnp.log(max_val**2 / mse) / jnp.log(10.0))


def _fspecial_gauss(size: int, sigma: float) -> jax.Array:
    """2-D Gaussian the way tf.image.ssim builds it (outer product of 1-D)."""
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1.0) / 2.0
    g = jnp.exp(-jnp.square(coords) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def structural_similarity(
    true: jax.Array,
    pred: jax.Array,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Per-image SSIM matching ``tf.image.ssim`` (reference
    ``metrics.py#structural_similarity``).

    Accepts ``[..., H, W, C]``; returns SSIM per image ``[...]``.
    """
    x = _f32(true)
    y = _f32(pred)
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    x = x.reshape((-1, h, w, c))
    y = y.reshape((-1, h, w, c))

    kern = _fspecial_gauss(filter_size, filter_sigma)  # [F,F]
    # depthwise filter: [F, F, 1, 1] applied per channel via feature groups
    kern4 = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))  # HWIO with I=1, O=c? use grouped

    def filt(img):
        # HIGHEST: keep the Gaussian filtering in true fp32 — metric parity
        # with the TF1 reference matters more than MXU throughput here.
        return lax.conv_general_dilated(
            img,
            kern4,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=lax.Precision.HIGHEST,
        )

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_x = filt(x)
    mu_y = filt(y)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = filt(x * x) - mu_xx
    sigma_yy = filt(y * y) - mu_yy
    sigma_xy = filt(x * y) - mu_xy

    lum = (2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)
    cs = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = lum * cs
    out = jnp.mean(ssim_map, axis=(1, 2, 3))
    return out.reshape(lead)


def cosine_similarity(x: jax.Array, y: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Cosine similarity along ``axis`` (used for VGG feature similarity,
    reference ``metrics.py#cosine_similarity``)."""
    x = _f32(x)
    y = _f32(y)
    xn = x * lax.rsqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)
    yn = y * lax.rsqrt(jnp.sum(jnp.square(y), axis=axis, keepdims=True) + eps)
    return jnp.sum(xn * yn, axis=axis)


METRIC_FNS = {
    "mse": mean_squared_error,
    "psnr": peak_signal_to_noise_ratio,
    "ssim": structural_similarity,
}
