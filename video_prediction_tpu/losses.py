"""Loss zoo.

TPU-native counterpart of the reference's ``video_prediction/losses.py``:
``l1_loss``, ``l2_loss``, ``charbonnier_loss``, ``gan_loss`` (sigmoid-CE
"GAN", least-squares "LSGAN", plus a hinge variant), and ``kl_loss`` between
two diagonal Gaussians. All are pure functions returning scalars in fp32
(loss reductions stay in fp32 even when the network computes in bf16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _f32(x):
    return x.astype(jnp.float32)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean absolute error (reference ``losses.py#l1_loss``)."""
    return jnp.mean(jnp.abs(_f32(pred) - _f32(target)))


def l2_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean squared error (reference ``losses.py#l2_loss``)."""
    return jnp.mean(jnp.square(_f32(pred) - _f32(target)))


def charbonnier_loss(pred: jax.Array, target: jax.Array, epsilon: float = 0.001) -> jax.Array:
    """Generalized Charbonnier (robust L1), reference ``losses.py#charbonnier_loss``."""
    diff = _f32(pred) - _f32(target)
    return jnp.mean(jnp.sqrt(jnp.square(diff) + epsilon**2))


def gan_loss(logits: jax.Array, labels: float, gan_loss_type: str = "LSGAN") -> jax.Array:
    """GAN objective on discriminator logits.

    Args:
      logits: discriminator outputs (pre-sigmoid for "GAN").
      labels: target label in [0, 1] — 1.0 for "real", 0.0 for "fake".
      gan_loss_type: ``GAN`` (sigmoid cross-entropy), ``LSGAN``
        (least-squares, the SAVP default), or ``hinge``.

    Reference: ``losses.py#gan_loss``. Soft labels (one-sided label
    smoothing, ``labels`` not in {0, 1}) route through
    ``sigmoid_kl_with_logits`` for the "GAN" type, as the reference does.
    """
    logits = _f32(logits)
    if gan_loss_type == "GAN":
        if labels not in (0.0, 1.0):
            return jnp.mean(sigmoid_kl_with_logits(logits, float(labels)))
        labels_arr = jnp.full_like(logits, labels)
        # sigmoid cross-entropy with logits
        loss = jnp.maximum(logits, 0) - logits * labels_arr + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        return jnp.mean(loss)
    if gan_loss_type == "LSGAN":
        return jnp.mean(jnp.square(logits - labels))
    if gan_loss_type == "hinge":
        if labels == 1.0:
            return jnp.mean(jax.nn.relu(1.0 - logits))
        if labels == 0.0:
            return jnp.mean(jax.nn.relu(1.0 + logits))
        # generator side (labels encodes "maximize realness")
        return -jnp.mean(logits)
    raise ValueError(f"unknown gan_loss_type {gan_loss_type!r}")


def sigmoid_kl_with_logits(logits: jax.Array, targets: float) -> jax.Array:
    """Per-element KL(targets || sigmoid(logits)) for a scalar soft label:
    sigmoid cross-entropy minus the target's own entropy, so the loss is 0
    when sigmoid(logits) == targets. Used for one-sided label smoothing of
    GAN discriminators (reference ``ops.py#sigmoid_kl_with_logits``).

    Returns the element-wise array (the caller reduces), matching the
    reference's contract.
    """
    import math

    logits = _f32(logits)
    if not isinstance(targets, float):
        raise TypeError(f"targets must be a python float, got {type(targets)}")
    if targets in (0.0, 1.0):
        entropy = 0.0
    else:
        entropy = -targets * math.log(targets) - (1.0 - targets) * math.log(1.0 - targets)
    t = jnp.full_like(logits, targets)
    # numerically-stable sigmoid cross-entropy with logits
    ce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return ce - entropy


def kl_loss(
    mu1: jax.Array,
    logvar1: jax.Array,
    mu2: jax.Array | None = None,
    logvar2: jax.Array | None = None,
) -> jax.Array:
    """KL( N(mu1, exp(logvar1)) || N(mu2, exp(logvar2)) ), per-batch mean.

    With ``mu2/logvar2`` omitted the prior is the unit Gaussian — the SAVP
    default. Sums over the latent dimension, means over all leading dims.
    Reference: ``losses.py#kl_loss``.
    """
    mu1, logvar1 = _f32(mu1), _f32(logvar1)
    if mu2 is None:
        kl = 0.5 * (jnp.square(mu1) + jnp.exp(logvar1) - 1.0 - logvar1)
    else:
        mu2, logvar2 = _f32(mu2), _f32(logvar2)
        kl = 0.5 * (
            logvar2
            - logvar1
            + (jnp.exp(logvar1) + jnp.square(mu1 - mu2)) / jnp.exp(logvar2)
            - 1.0
        )
    return jnp.mean(jnp.sum(kl, axis=-1))


def feature_matching_loss(feats_real, feats_fake, norm: str = "l2") -> jax.Array:
    """Discriminator feature-matching loss used by the VAE-GAN path
    (reference ``base_model.py`` ``*_feature_cdist_weight`` /
    feature-matching terms): mean distance between per-layer features.
    """
    assert len(feats_real) == len(feats_fake)
    total = jnp.float32(0.0)
    for fr, ff in zip(feats_real, feats_fake):
        fr = jax.lax.stop_gradient(_f32(fr))
        ff = _f32(ff)
        if norm == "l2":
            total = total + jnp.mean(jnp.square(fr - ff))
        else:
            total = total + jnp.mean(jnp.abs(fr - ff))
    return total / max(len(feats_real), 1)
