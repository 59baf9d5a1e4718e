"""Convolutional RNN cells.

TPU-native counterpart of the reference's ``video_prediction/rnn_ops.py``
(``BasicConv2DLSTMCell`` with optional normalization, ``Conv2DGRUCell``).

Design notes (TPU-first):
- A single conv computes all gates at once (4*filters for LSTM, handled as
  one big MXU matmul by XLA) instead of per-gate convs.
- Cells are plain flax modules with ``(carry, x) -> (carry, y)`` signature so
  they compose with ``flax.linen.scan`` / ``jax.lax.scan`` over time — the
  replacement for the reference's ``tf.nn.dynamic_rnn`` time loop.
- State is kept in the compute dtype; gate math runs in fp32 for stability
  when the network computes in bf16.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvLSTMCell(nn.Module):
    """Conv LSTM cell (reference ``rnn_ops.py#BasicConv2DLSTMCell``).

    Optional per-gate layer normalization (the reference's
    ``normalizer_fn=tf.contrib.layers.layer_norm`` path): normalizing the
    four gate pre-activations separately, plus the new cell state.
    """

    features: int
    kernel_size: int = 5
    use_norm: bool = False
    forget_bias: float = 1.0
    # Gate-conv layout, measured round 3 on the full SAVP train step:
    # "merged" = ONE conv over concat([x, h]) (the reference's
    # BasicConv2DLSTMCell structure; doubled contraction depth) — fastest
    # when the time scan is fully unrolled (batch 16: 253 vs 256 ms/step);
    # "split" = separate x/h convs + add — fastest in the ROLLED-scan
    # remat regime (batch 64 unroll 6: 713 vs 746 ms/step, the merged
    # form's concat inflates remat recompute). Param trees differ, so a
    # checkpoint is tied to its layout (hparams travel in options.json).
    # Default "split" matches ModelHparams.lstm_gate_conv and the param
    # layout every pre-round-3 checkpoint holds (SAVPCell always passes
    # the hparam explicitly; this default protects direct cell users).
    gate_conv: str = "split"
    dtype: Dtype | None = None
    # Dtype of the gate MATH (post-conv LN + sigmoid/tanh + cell-state
    # update). Default fp32 for stability — the documented invariant, and
    # the numerics every golden trajectory pins. bfloat16 halves the
    # dominant HBM term of the large-batch train step (the r3 OOM report
    # fingered eleven f32 [128,64,64,128] gate-conv temps); it is a
    # measured A/B lever (hparams.gate_dtype), NOT a default. LN params
    # stay fp32 either way (flax param_dtype default).
    gate_dtype: Dtype = jnp.float32

    def initialize_carry(self, batch: int, spatial: Tuple[int, int], dtype=jnp.float32):
        h, w = spatial
        shape = (batch, h, w, self.features)
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @nn.compact
    def __call__(self, carry, x):
        c, h = carry
        if self.gate_conv == "merged":
            z = nn.Conv(
                4 * self.features,
                (self.kernel_size, self.kernel_size),
                padding="SAME",
                use_bias=not self.use_norm,
                dtype=self.dtype,
                name="gates",
            )(jnp.concatenate([x, h.astype(x.dtype)], axis=-1))
        elif self.gate_conv == "split":
            zx = nn.Conv(
                4 * self.features,
                (self.kernel_size, self.kernel_size),
                padding="SAME",
                use_bias=not self.use_norm,
                dtype=self.dtype,
                name="gates_x",
            )(x)
            zh = nn.Conv(
                4 * self.features,
                (self.kernel_size, self.kernel_size),
                padding="SAME",
                use_bias=False,
                dtype=self.dtype,
                name="gates_h",
            )(h)
            z = zx + zh
        else:
            raise ValueError(f"unknown gate_conv {self.gate_conv!r}")
        gdt = self.gate_dtype
        # LayerNorm dtype=None promotes with its fp32 params (i.e. computes
        # fp32); pass the gate dtype explicitly so bf16 gates stay bf16
        ln_dtype = None if gdt == jnp.float32 else gdt
        z = z.astype(gdt)
        # NOTE: keep the per-gate LayerNorms as four separate calls on 4-D
        # tensors. Fusing them into one grouped LN over a [B,H,W,4,C] view
        # (identical math, 1/4 the kernels) measured 1.59x SLOWER end-to-end
        # on TPU — XLA lowers the 5-D small-trailing-dim layout badly.
        i, f, g, o = jnp.split(z, 4, axis=-1)
        if self.use_norm:
            norm = lambda n: nn.LayerNorm(name=n, use_bias=True, use_scale=True, dtype=ln_dtype)
            i, f, g, o = norm("ln_i")(i), norm("ln_f")(f), norm("ln_g")(g), norm("ln_o")(o)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f + jnp.asarray(self.forget_bias, gdt))
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c.astype(gdt) + i * g
        c_out = nn.LayerNorm(name="ln_c", dtype=ln_dtype)(c_new) if self.use_norm else c_new
        h_new = o * jnp.tanh(c_out)
        c_new = c_new.astype(c.dtype)
        h_new = h_new.astype(h.dtype)
        return (c_new, h_new), h_new


class ConvGRUCell(nn.Module):
    """Conv GRU cell (reference ``rnn_ops.py#Conv2DGRUCell``)."""

    features: int
    kernel_size: int = 5
    dtype: Dtype | None = None

    def initialize_carry(self, batch: int, spatial: Tuple[int, int], dtype=jnp.float32):
        h, w = spatial
        return jnp.zeros((batch, h, w, self.features), dtype)

    @nn.compact
    def __call__(self, carry, x):
        h = carry
        conv = lambda feats, name, bias=True: nn.Conv(
            feats,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            use_bias=bias,
            dtype=self.dtype,
            name=name,
        )
        ru = conv(2 * self.features, "gates")(jnp.concatenate([x, h], axis=-1))
        ru = jax.nn.sigmoid(ru.astype(jnp.float32) + 1.0)
        r, u = jnp.split(ru, 2, axis=-1)
        r = r.astype(h.dtype)
        cand = conv(self.features, "candidate")(jnp.concatenate([x, r * h], axis=-1))
        cand = jnp.tanh(cand.astype(jnp.float32))
        h_new = u * h.astype(jnp.float32) + (1.0 - u) * cand
        h_new = h_new.astype(h.dtype)
        return h_new, h_new
