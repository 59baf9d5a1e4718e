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
round 3): the r2 "blanket HTTP 500" was shape-specific. Strictly-2-D
ROW-WISE kernels (lane dim = channels, keepdims reductions, params as
``[rows, C]`` blocks) compile and run on hardware — ``fused_ln_gate``
below is the proof. What still fails: >2-D refs with tiny trailing dims
(the CDNA kernel's ``[H,W,C=3]`` blocks and ``composite_fused``'s
``[K,H,W,C]``), which Mosaic cannot tile onto (8,128) lanes. Measured on
hardware (chained in-jit, value-synced): ``fused_ln_gate`` is 1.19x
faster than XLA's loop fusion at C=64 but 1.62x SLOWER at C=32 (lane
underfill), and the model's largest-row scale is C=32 — so the XLA path
stays production for all three kernels; they remain parity-tested in
interpret mode (tests/test_pallas.py), ``fused_ln_gate`` also
compile-proven on the real Mosaic pipeline.
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
# fused per-gate LayerNorm + ConvLSTM gate math (row-wise 2-D)
# --------------------------------------------------------------------- #
_LN_EPS = 1e-6


def _ln_rows(x, scale, bias):
    """LayerNorm over the lane (last) axis; keepdims so every
    intermediate stays 2-D (this Mosaic pipeline's constraint)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias


def _ln_gate_kernel(forget_bias, z_ref, c_ref, lnp_ref, c_out_ref, h_out_ref):
    """Rows x channels formulation of ``ops/rnn.py#ConvLSTMCell`` post-conv
    math: z [R,4C] gate preactivations, c [R,C] previous cell, lnp [10,C]
    LN scale/bias rows for (i, f, g, o, c) -> (c_new, h_new) [R,C].

    The whole chain — four per-gate LNs, sigmoids/tanh, cell update, cell
    LN, output gate — runs in VMEM in fp32 and writes exactly two [R,C]
    outputs, vs. the XLA loop fusion's multiple intermediate
    materializations."""
    cdim = c_ref.shape[-1]
    z = z_ref[:].astype(jnp.float32)
    c = c_ref[:].astype(jnp.float32)
    lnp = lnp_ref[:].astype(jnp.float32)
    i = _ln_rows(z[:, 0 * cdim : 1 * cdim], lnp[0:1, :], lnp[1:2, :])
    f = _ln_rows(z[:, 1 * cdim : 2 * cdim], lnp[2:3, :], lnp[3:4, :])
    g = _ln_rows(z[:, 2 * cdim : 3 * cdim], lnp[4:5, :], lnp[5:6, :])
    o = _ln_rows(z[:, 3 * cdim : 4 * cdim], lnp[6:7, :], lnp[7:8, :])
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f + forget_bias)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    c_ln = _ln_rows(c_new, lnp[8:9, :], lnp[9:10, :])
    h_new = o * jnp.tanh(c_ln)
    c_out_ref[:] = c_new.astype(c_out_ref.dtype)
    h_out_ref[:] = h_new.astype(h_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("forget_bias", "block_rows", "interpret"))
def fused_ln_gate(
    z: jax.Array,
    c: jax.Array,
    ln_params: jax.Array,
    forget_bias: float = 1.0,
    block_rows: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused normalized-ConvLSTM gate math: ``z [R,4C]`` preactivations +
    ``c [R,C]`` + ``ln_params [10,C]`` (scale/bias rows for i,f,g,o,c)
    -> ``(c_new, h_new)`` each ``[R,C]`` in ``c.dtype``.

    Forward-only (``pallas_call`` is not AD-differentiable; production
    training keeps the XLA path — see module docstring for the measured
    C=32 lane-underfill loss that also argues against integration)."""
    r, _ = z.shape
    cdim = c.shape[-1]
    if r % block_rows:
        block_rows = r
    return pl.pallas_call(
        functools.partial(_ln_gate_kernel, forget_bias),
        grid=(r // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, 4 * cdim), lambda ib: (ib, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, cdim), lambda ib: (ib, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((10, cdim), lambda ib: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, cdim), lambda ib: (ib, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, cdim), lambda ib: (ib, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, cdim), c.dtype),
            jax.ShapeDtypeStruct((r, cdim), c.dtype),
        ],
        interpret=interpret,
    )(z, c, ln_params)


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
