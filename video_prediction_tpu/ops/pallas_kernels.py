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

Status on this build's tunneled-TPU remote-compile pipeline (re-probed
round 2): trivial kernels still compile and run on hardware, but BOTH
kernels below are rejected by the remote Mosaic helper (HTTP 500) — the
CDNA kernel even after reformulating every intermediate as 2-D, and
``composite_fused`` (which compiled on an earlier helper version). The
production CDNA path is therefore the XLA tap-accumulation in
``ops/cdna.py`` (which also measured faster end-to-end); these kernels
remain A/B-tested in interpret mode for when a full Mosaic pipeline is
available.
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
def _cdna_kernel(img_ref, kern_ref, out_ref, taps_ref):
    """One batch element: image [H,W,C] x kernels [kh*kw,N] -> [N,H,W,C].

    All-2-D formulation (this remote Mosaic pipeline rejects the
    scalar-indexed 1-D broadcast variant): stack the kh*kw shifted taps as
    rows of a [K2, H*W*C] scratch matrix, then one MXU matmul
    ``kern^T [N,K2] @ taps [K2,HWC]``.
    """
    h, w, c = img_ref.shape
    k2, n = kern_ref.shape
    kh = kw = int(k2**0.5)
    ph, pw = (kh - 1) // 2, (kw - 1) // 2

    img = img_ref[:].astype(jnp.float32)
    padded = jnp.pad(img, ((ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
    for i in range(kh):
        for j in range(kw):
            tap = jax.lax.slice(padded, (i, j, 0), (i + h, j + w, c))
            # strictly 2-D shapes: this remote Mosaic pipeline rejects any
            # 1-D intermediate (reshape(h*w*c) / 1-D row writes)
            taps_ref[i * kw + j : i * kw + j + 1, :] = tap.reshape(1, h * w * c)
    kern = kern_ref[:].astype(jnp.float32)  # [K2, N]
    out = jax.lax.dot_general(
        kern,
        taps_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, H*W*C]
    out_ref[:] = out.reshape(n, h, w, c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_cdna_kernels_fused(image: jax.Array, kernels: jax.Array, interpret: bool = False) -> jax.Array:
    """Drop-in for ``ops.cdna.apply_cdna_kernels`` (same contract:
    ``[B,H,W,C] x [B,kh,kw,N] -> [B,N,H,W,C]``), fused in VMEM."""
    b, h, w, c = image.shape
    _, kh, kw, n = kernels.shape
    kmat = kernels.reshape(b, kh * kw, n)
    return pl.pallas_call(
        _cdna_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, kh * kw, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, n, h, w, c), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, h, w, c), image.dtype),
        scratch_shapes=[pltpu.VMEM((kh * kw, h * w * c), jnp.float32)],
        interpret=interpret,
    )(image, kmat)


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
