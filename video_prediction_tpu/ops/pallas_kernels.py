"""Pallas TPU kernels for the hot memory-bound ops.

The XLA path for CDNA (``ops/cdna.py``) materializes a ``[B,H,W,C,K2]``
patch tensor in HBM — a 25x write+read amplification of the image for 5x5
kernels. The fused kernel below keeps the (small) per-sample image resident
in VMEM, accumulates the N transformed images tap-by-tap with static
shifted slices, and applies the compositing masks in the same kernel, so
HBM traffic is just: read image + masks + candidates once, write the
composited frame once.

These kernels are the "native" layer of this framework (SURVEY §2.1: the
reference has no custom native ops; its flops live in cuDNN — ours live in
XLA + Pallas/Mosaic).

All kernels take ``interpret=`` for CPU-mode testing; ``use_pallas()``
gates the production path to TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# --------------------------------------------------------------------- #
# fused CDNA apply
# --------------------------------------------------------------------- #
def _cdna_kernel(img_ref, kern_ref, out_ref):
    """One batch element: image [H,W,C] x kernels [kh,kw,N] -> [N,H,W,C].

    Taps accumulate in fp32; static shifted slices of the zero-padded image
    replace patch materialization.
    """
    h, w, c = img_ref.shape
    kh, kw, n = kern_ref.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2

    img = img_ref[:].astype(jnp.float32)
    kern = kern_ref[:].astype(jnp.float32)
    padded = jnp.pad(img, ((ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))

    acc = jnp.zeros((n, h, w, c), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            tap = jax.lax.slice(padded, (i, j, 0), (i + h, j + w, c))  # [H,W,C]
            acc = acc + tap[None, :, :, :] * kern[i, j, :][:, None, None, None]
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_cdna_kernels_fused(image: jax.Array, kernels: jax.Array, interpret: bool = False) -> jax.Array:
    """Drop-in for ``ops.cdna.apply_cdna_kernels`` (same contract:
    ``[B,H,W,C] x [B,kh,kw,N] -> [B,N,H,W,C]``), fused in VMEM."""
    b, h, w, c = image.shape
    _, kh, kw, n = kernels.shape
    return pl.pallas_call(
        _cdna_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, kh, kw, n), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, n, h, w, c), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, h, w, c), image.dtype),
        interpret=interpret,
    )(image, kernels)


# --------------------------------------------------------------------- #
# fused masked compositing
# --------------------------------------------------------------------- #
def _composite_kernel(cand_ref, logits_ref, out_ref):
    """One batch element: candidates [K,H,W,C] + mask logits [H,W,K]
    -> softmax-composited image [H,W,C], fused (no [H,W,C,K] HBM tensor)."""
    cand = cand_ref[:].astype(jnp.float32)  # [K,H,W,C]
    logits = logits_ref[:].astype(jnp.float32)  # [H,W,K]
    masks = jax.nn.softmax(logits, axis=-1)
    weighted = cand * jnp.moveaxis(masks, -1, 0)[:, :, :, None]
    out_ref[:] = jnp.sum(weighted, axis=0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def composite_fused(candidates: jax.Array, mask_logits: jax.Array, interpret: bool = False) -> jax.Array:
    """``[B,K,H,W,C] candidates + [B,H,W,K] logits -> [B,H,W,C]``:
    softmax over K and convex combination in one VMEM pass."""
    b, k, h, w, c = candidates.shape
    return pl.pallas_call(
        _composite_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, k, h, w, c), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, h, w, k), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), candidates.dtype),
        interpret=interpret,
    )(candidates, mask_logits)
