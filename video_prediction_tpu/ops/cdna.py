"""CDNA / DNA transformation-kernel application.

The core numerical op of the SAVP/CDNA model family (reference
``video_prediction/models/savp_model.py#apply_cdna_kernels`` /
``#apply_dna_kernels``; originally Finn et al. 2016): warp previous frames by
predicted, normalized convolution kernels.

TPU-first formulation: instead of the reference's "fold batch into feature
groups and run one grouped conv" CUDA trick, both ops are written as kh*kw
SHIFTED FUSED MULTIPLY-ADDS over a padded frame — XLA fuses them into one
loop over the image, no patch tensor ever lands in HBM, and the transpose
(backward) is just more shifted FMAs. Measured on this backend this beats
the patches+einsum alternative 3.6x on the backward pass (the einsum
transpose materializes patch cotangents) and avoids
``conv_general_dilated_patches``, which bf16-rounds its inputs here. Fully
static shapes; differentiates without custom VJPs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

RELU_SHIFT = 1e-12


def identity_kernel(kernel_size: int, dtype=jnp.float32) -> jax.Array:
    """Delta kernel: applying it reproduces the input image exactly."""
    k = jnp.zeros((kernel_size, kernel_size), dtype)
    c = kernel_size // 2
    return k.at[c, c].set(1.0)


def normalize_kernels(kernels: jax.Array, method: str = "softmax") -> jax.Array:
    """Normalize transformation kernels over the spatial-tap axes.

    Args:
      kernels: ``[..., kh, kw, N]`` raw kernel logits/activations.
      method: ``softmax`` (SAVP) or ``relu`` (Finn et al. CDNA: relu then
        divide by sum, with a shift for stability).
    """
    kh, kw, n = kernels.shape[-3:]
    flat = kernels.reshape(kernels.shape[:-3] + (kh * kw, n))
    if method == "softmax":
        flat = jax.nn.softmax(flat, axis=-2)
    elif method == "relu":
        flat = jax.nn.relu(flat - RELU_SHIFT) + RELU_SHIFT
        flat = flat / jnp.sum(flat, axis=-2, keepdims=True)
    else:
        raise ValueError(f"unknown kernel normalization {method!r}")
    return flat.reshape(kernels.shape)


def apply_cdna_kernels(image: jax.Array, kernels: jax.Array) -> jax.Array:
    """Convolve each sample's image with its own bank of N kernels.

    Args:
      image: ``[B, H, W, C]`` previous frame(s).
      kernels: ``[B, kh, kw, N]`` normalized per-sample kernels.

    Returns:
      ``[B, N, H, W, C]`` transformed images.

    Reference: ``savp_model.py#apply_cdna_kernels`` (there: batch folded into
    the channel dim of a single depthwise conv). Here: kh*kw shifted FMAs —
    see the module docstring for why this beats patches+einsum on TPU.
    """
    b, h, w, c = image.shape
    _, kh, kw, n = kernels.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    padded = jnp.pad(image, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
    kernels = kernels.astype(jnp.float32)
    # Tap-accumulation instead of patches+einsum: kh*kw shifted FMAs that XLA
    # fuses into one loop over the image — no [B,H,W,C,K2] patch tensor in
    # HBM, and (measured on v5e) a 3.6x faster backward: the einsum transpose
    # materializes patch cotangents, the FMA transpose is more shifted FMAs.
    acc = jnp.zeros((b, n, h, w, c), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            tap = lax.slice(padded, (0, i, j, 0), (b, i + h, j + w, c))
            wij = kernels[:, i, j, :]  # [B,N]
            acc = acc + tap[:, None].astype(jnp.float32) * wij[:, :, None, None, None]
    return acc.astype(image.dtype)


def apply_dna_kernels(image: jax.Array, kernels: jax.Array) -> jax.Array:
    """Apply per-pixel (dynamic neural advection) kernels.

    Args:
      image: ``[B, H, W, C]``.
      kernels: ``[B, H, W, kh, kw, N]`` (or N==1 squeezed to 5-D) normalized
        per-pixel kernels.

    Returns:
      ``[B, N, H, W, C]``.

    Reference: ``savp_model.py#apply_dna_kernels``.
    """
    if kernels.ndim == 5:
        kernels = kernels[..., None]
    b, h, w, kh, kw, n = kernels.shape
    c = image.shape[-1]
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    padded = jnp.pad(image, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
    kernels = kernels.astype(jnp.float32)
    # same tap-accumulation formulation as apply_cdna_kernels, with the
    # per-pixel weight [B,H,W,N] broadcast over channels
    acc = jnp.zeros((b, n, h, w, c), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            tap = lax.slice(padded, (0, i, j, 0), (b, i + h, j + w, c))
            wij = jnp.moveaxis(kernels[:, :, :, i, j, :], -1, 1)  # [B,N,H,W]
            acc = acc + tap[:, None].astype(jnp.float32) * wij[..., None]
    return acc.astype(image.dtype)


def apply_kernels(image: jax.Array, kernels: jax.Array) -> jax.Array:
    """Dispatch on kernel rank: 4-D -> CDNA, 5/6-D -> DNA.

    Reference: ``savp_model.py#apply_kernels``.
    """
    if kernels.ndim == 4:
        return apply_cdna_kernels(image, kernels)
    return apply_dna_kernels(image, kernels)
