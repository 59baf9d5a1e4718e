"""Shared network architectures: SN-GAN discriminators and latent encoders.

TPU-native counterpart of the reference's ``video_prediction/models/
networks.py`` (SNGAN-style image and video discriminators, Miyato et al.)
and the SAVP posterior encoder (``savp_model.py#create_encoder``).

Discriminators consume clips as ``[B, T, H, W, C]``; the image discriminator
folds time into batch (one big MXU-friendly batch), the video discriminator
runs 3-D convs over the clip. Both return (logits, feature list) — features
feed the VAE-GAN feature-matching loss.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_prediction_tpu.ops.layers import lrelu
from video_prediction_tpu.ops.spectral import SpectralConv2D, SpectralConv3D, SpectralDense

Dtype = Any


class ImageSNDiscriminator(nn.Module):
    """Per-frame SNGAN discriminator (reference ``networks.py#
    image_sn_discriminator``): 4 SN-conv blocks then SN-dense logit.

    Input ``[B, T, H, W, C]``; time is folded into batch.
    Returns ``(logits [B*T, 1], features)``.
    """

    ndf: int = 64
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, clips: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        b, t, h, w, c = clips.shape
        x = clips.reshape(b * t, h, w, c)
        feats = []
        spec = [
            (self.ndf, 3, 1),
            (self.ndf, 4, 2),
            (self.ndf * 2, 3, 1),
            (self.ndf * 2, 4, 2),
            (self.ndf * 4, 3, 1),
            (self.ndf * 4, 4, 2),
        ]
        for i, (f, k, s) in enumerate(spec):
            x = SpectralConv2D(f, k, s, dtype=self.dtype, name=f"sn_conv{i}")(x)
            x = lrelu(x, 0.1)
            feats.append(x)
        x = x.reshape(b * t, -1)
        logits = SpectralDense(1, dtype=self.dtype, name="sn_fc")(x)
        return logits, feats


class VideoSNDiscriminator(nn.Module):
    """Clip-level SNGAN discriminator with 3-D convs (reference
    ``networks.py#video_sn_discriminator``).

    Input ``[B, T, H, W, C]``; returns ``(logits [B, 1], features)``.
    """

    ndf: int = 64
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, clips: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        x = clips
        feats = []
        spec = [
            (self.ndf, (1, 3, 3), (1, 1, 1)),
            (self.ndf, (3, 4, 4), (1, 2, 2)),
            (self.ndf * 2, (3, 3, 3), (1, 1, 1)),
            (self.ndf * 2, (3, 4, 4), (2, 2, 2)),
            (self.ndf * 4, (3, 3, 3), (1, 1, 1)),
            (self.ndf * 4, (3, 4, 4), (2, 2, 2)),
        ]
        for i, (f, k, s) in enumerate(spec):
            x = SpectralConv3D(f, k, s, dtype=self.dtype, name=f"sn_conv3d{i}")(x)
            x = lrelu(x, 0.1)
            feats.append(x)
        x = x.reshape(x.shape[0], -1)
        logits = SpectralDense(1, dtype=self.dtype, name="sn_fc")(x)
        return logits, feats


class ACVideoSNDiscriminator(nn.Module):
    """Action-conditioned clip discriminator (reference
    ``savp_model.py#create_acvideo_discriminator``): the video SN-disc
    stack with each frame's transition action tiled over H,W and
    concatenated to the frame's channels, so D judges *controlled* motion
    plausibility, not just motion plausibility.

    Input ``clips [B, T, H, W, C]`` + ``actions [B, T, na]`` (action t is
    the one producing clip frame t); returns ``(logits [B, 1], features)``.
    """

    ndf: int = 64
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, clips: jax.Array, actions: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        b, t, h, w, c = clips.shape
        tiled = jnp.broadcast_to(
            actions[:, :, None, None, :], (b, t, h, w, actions.shape[-1])
        ).astype(clips.dtype)
        x = jnp.concatenate([clips, tiled], axis=-1)
        feats = []
        spec = [
            (self.ndf, (1, 3, 3), (1, 1, 1)),
            (self.ndf, (3, 4, 4), (1, 2, 2)),
            (self.ndf * 2, (3, 3, 3), (1, 1, 1)),
            (self.ndf * 2, (3, 4, 4), (2, 2, 2)),
            (self.ndf * 4, (3, 3, 3), (1, 1, 1)),
            (self.ndf * 4, (3, 4, 4), (2, 2, 2)),
        ]
        for i, (f, k, s) in enumerate(spec):
            x = SpectralConv3D(f, k, s, dtype=self.dtype, name=f"sn_conv3d{i}")(x)
            x = lrelu(x, 0.1)
            feats.append(x)
        x = x.reshape(x.shape[0], -1)
        logits = SpectralDense(1, dtype=self.dtype, name="sn_fc")(x)
        return logits, feats


class PosteriorEncoder(nn.Module):
    """Frame-pair latent posterior q(z_t | x_t, x_{t+1}).

    Reference: ``savp_model.py#create_encoder`` / ``encoder_fn`` — a conv
    net over concatenated adjacent frames emitting (mu, logvar) per step.

    Input ``images [B, T, H, W, C]``; output ``(mu, logvar) [B, T-1, nz]``.
    All T-1 pairs are processed as one folded batch (MXU-friendly) instead
    of a per-step loop.
    """

    nz: int = 8
    nef: int = 64
    n_layers: int = 3
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, images: jax.Array) -> Tuple[jax.Array, jax.Array]:
        b, t, h, w, c = images.shape
        pairs = jnp.concatenate([images[:, :-1], images[:, 1:]], axis=-1)  # [B,T-1,H,W,2C]
        x = pairs.reshape(b * (t - 1), h, w, 2 * c)
        x = nn.Conv(self.nef, (4, 4), strides=(2, 2), dtype=self.dtype, name="conv0")(x)
        x = lrelu(x, 0.2)
        for i in range(1, self.n_layers):
            f = self.nef * min(2**i, 4)
            x = nn.Conv(f, (4, 4), strides=(2, 2), dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=None, group_size=1, name=f"norm{i}")(x)
            x = lrelu(x, 0.2)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        mu = nn.Dense(self.nz, name="mu")(x).reshape(b, t - 1, self.nz)
        logvar = nn.Dense(self.nz, name="logvar")(x).reshape(b, t - 1, self.nz)
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)


class LearnedPrior(nn.Module):
    """Learned conditional prior p(z_t | x_{<=t}) used when
    ``hparams.learn_prior`` (SV2P-style / reference ``learn_prior`` hparam).

    Conv net over the *context* frame emitting (mu, logvar) per step.
    Input ``images [B, T, H, W, C]`` (frames 0..T-2); output per-step
    ``(mu, logvar) [B, T-1, nz]``.
    """

    nz: int = 8
    nef: int = 32
    n_layers: int = 3
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, images: jax.Array) -> Tuple[jax.Array, jax.Array]:
        b, t, h, w, c = images.shape
        x = images[:, :-1].reshape(b * (t - 1), h, w, c)
        for i in range(self.n_layers):
            f = self.nef * min(2**i, 4)
            x = nn.Conv(f, (4, 4), strides=(2, 2), dtype=self.dtype, name=f"conv{i}")(x)
            x = lrelu(x, 0.2)
        x = jnp.mean(x, axis=(1, 2))
        mu = nn.Dense(self.nz, name="mu")(x).reshape(b, t - 1, self.nz)
        logvar = nn.Dense(self.nz, name="logvar")(x).reshape(b, t - 1, self.nz)
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)
