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
    conv3d_taps: bool = False  # time-tap 2-D decomposition (ops/spectral.py)

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
            x = SpectralConv3D(
                f, k, s, dtype=self.dtype, use_taps=self.conv3d_taps, name=f"sn_conv3d{i}"
            )(x)
            x = lrelu(x, 0.1)
            feats.append(x)
        x = x.reshape(x.shape[0], -1)
        logits = SpectralDense(1, dtype=self.dtype, name="sn_fc")(x)
        return logits, feats


class ACVideoSNDiscriminator(nn.Module):
    """Action-conditioned clip discriminator (reference
    ``savp_model.py#create_acvideo_discriminator``): consecutive frame
    pairs are concatenated channel-wise (``clips[:-1] ++ clips[1:]``) and
    the action *between* each pair is tiled over H,W onto the pair's
    channels, so D scores explicit ``(frame_t, frame_{t+1}, action_t)``
    transitions — controlled-motion plausibility, not just motion.

    Input ``clips [B, T, H, W, C]`` + ``actions [B, T, na]`` (action t is
    the one producing clip frame t, so ``actions[:, 1:]`` drives the pair
    ``(clip_t, clip_{t+1})``); returns ``(logits [B, 1], features)``.
    """

    ndf: int = 64
    dtype: Dtype | None = None
    conv3d_taps: bool = False  # time-tap 2-D decomposition (ops/spectral.py)

    @nn.compact
    def __call__(self, clips: jax.Array, actions: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        b, t, h, w, c = clips.shape
        pairs = jnp.concatenate([clips[:, :-1], clips[:, 1:]], axis=-1)  # [B,T-1,H,W,2C]
        trans_actions = actions[:, 1:]  # action between each frame pair
        tiled = jnp.broadcast_to(
            trans_actions[:, :, None, None, :], (b, t - 1, h, w, actions.shape[-1])
        ).astype(clips.dtype)
        x = jnp.concatenate([pairs, tiled], axis=-1)
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
            x = SpectralConv3D(
                f, k, s, dtype=self.dtype, use_taps=self.conv3d_taps, name=f"sn_conv3d{i}"
            )(x)
            x = lrelu(x, 0.1)
            feats.append(x)
        x = x.reshape(x.shape[0], -1)
        logits = SpectralDense(1, dtype=self.dtype, name="sn_fc")(x)
        return logits, feats


class PosteriorEncoder(nn.Module):
    """Frame-pair latent posterior q(z_t | x_t, x_{t+1}).

    Reference: ``savp_model.py#create_encoder`` / ``encoder_fn`` — a conv
    net over concatenated adjacent frames emitting (mu, logvar) per step.

    Input ``images [B, T, H, W, C]``; output ``(mu, logvar) [B, T-1, nz]``
    — or ``[B, 1, nz]`` with ``time_invariant=True`` (the SV2P semantic,
    reference ``sv2p_model.py``: ONE latent per sequence, conditioned on
    the whole clip — realized here by time-averaging the shared trunk's
    pooled pair features before the mu/logvar heads, so the param tree is
    identical to the per-step posterior and checkpoints interchange).
    All T-1 pairs are processed as one folded batch (MXU-friendly) instead
    of a per-step loop.
    """

    nz: int = 8
    nef: int = 64
    n_layers: int = 3
    time_invariant: bool = False
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
        tz = t - 1
        if self.time_invariant:
            x = jnp.mean(x.reshape(b, t - 1, -1), axis=1)  # whole-clip features
            tz = 1
        mu = nn.Dense(self.nz, name="mu")(x).reshape(b, tz, self.nz)
        logvar = nn.Dense(self.nz, name="logvar")(x).reshape(b, tz, self.nz)
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)


class LearnedPrior(nn.Module):
    """Learned conditional prior p(z_t | x_t) used when
    ``hparams.learn_prior`` (reference ``learn_prior`` hparam).

    Conv net over ONE frame emitting ``(mu, logvar) [B, nz]``. It runs
    *inside* the generator cell on the frame the cell actually consumes —
    ground truth during context / teacher-forced steps, the model's own
    prediction otherwise — so evaluation rollouts never condition z_t on
    future ground-truth frames that would not exist at deployment
    (the r2 VERDICT's learned-prior leak; same class of fix as the state
    rollout's).
    """

    nz: int = 8
    nef: int = 32
    n_layers: int = 3
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, image: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x = image.astype(self.dtype or image.dtype)
        for i in range(self.n_layers):
            f = self.nef * min(2**i, 4)
            x = nn.Conv(f, (4, 4), strides=(2, 2), dtype=self.dtype, name=f"conv{i}")(x)
            x = lrelu(x, 0.2)
        x = jnp.mean(x, axis=(1, 2))
        mu = nn.Dense(self.nz, name="mu")(x)
        logvar = nn.Dense(self.nz, name="logvar")(x)
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)
