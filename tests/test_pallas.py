"""A/B numerics tests: Pallas fused kernels vs the XLA reference path
(run in interpret mode on CPU; the same kernels compile on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_prediction_tpu.ops import cdna as cdna_ops
from video_prediction_tpu.ops import pallas_kernels as pk


class TestFusedCDNA:
    def test_matches_xla_path(self):
        rng = jax.random.PRNGKey(0)
        img = jax.random.uniform(rng, (2, 8, 8, 3))
        kernels = cdna_ops.normalize_kernels(
            jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 4)), "softmax"
        )
        ref = cdna_ops.apply_cdna_kernels(img, kernels)
        out = pk.apply_cdna_kernels_fused(img, kernels, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_identity_kernel(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (1, 6, 6, 2))
        k = cdna_ops.identity_kernel(3)
        kernels = jnp.tile(k[None, :, :, None], (1, 1, 1, 1))
        out = pk.apply_cdna_kernels_fused(img, kernels, interpret=True)
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(img), atol=1e-6)


class TestFusedLNGate:
    def test_matches_convlstm_cell_math(self):
        """Row-wise fused kernel vs ops/rnn.py#ConvLSTMCell's post-conv
        math (per-gate LN + gate nonlinearities + cell LN), fp32 in/out."""
        r, cdim = 16, 8
        rng = np.random.RandomState(0)
        z = jnp.asarray(rng.randn(r, 4 * cdim), jnp.float32)
        c = jnp.asarray(rng.randn(r, cdim), jnp.float32)
        lnp = jnp.asarray(rng.rand(10, cdim) + 0.5, jnp.float32)

        def ln(x, s, b):
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            return (x - mu) / np.sqrt(var + 1e-6) * s + b

        zn, cn, ln_np = np.asarray(z), np.asarray(c), np.asarray(lnp)
        i = 1 / (1 + np.exp(-ln(zn[:, :cdim], ln_np[0], ln_np[1])))
        f = 1 / (1 + np.exp(-(ln(zn[:, cdim : 2 * cdim], ln_np[2], ln_np[3]) + 1.0)))
        g = np.tanh(ln(zn[:, 2 * cdim : 3 * cdim], ln_np[4], ln_np[5]))
        o = 1 / (1 + np.exp(-ln(zn[:, 3 * cdim :], ln_np[6], ln_np[7])))
        c_ref = f * cn + i * g
        h_ref = o * np.tanh(ln(c_ref, ln_np[8], ln_np[9]))

        c_new, h_new = pk.fused_ln_gate(z, c, lnp, interpret=True)
        np.testing.assert_allclose(np.asarray(c_new), c_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_new), h_ref, atol=1e-5)

    def test_output_dtype_follows_cell_state(self):
        r, cdim = 8, 8
        z = jnp.zeros((r, 4 * cdim), jnp.bfloat16)
        c = jnp.zeros((r, cdim), jnp.bfloat16)
        lnp = jnp.ones((10, cdim), jnp.float32)
        c_new, h_new = pk.fused_ln_gate(z, c, lnp, interpret=True)
        assert c_new.dtype == jnp.bfloat16 and h_new.dtype == jnp.bfloat16


class TestFusedComposite:
    def test_matches_reference_einsum(self):
        b, k, h, w, c = 2, 5, 8, 8, 3
        cand = jax.random.uniform(jax.random.PRNGKey(0), (b, k, h, w, c))
        logits = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, k))
        out = pk.composite_fused(cand, logits, interpret=True)
        masks = jax.nn.softmax(logits, axis=-1)
        ref = jnp.einsum("bkhwc,bhwk->bhwc", cand, masks)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_masks_are_convex(self):
        # uniform logits -> output is the mean of candidates
        b, k, h, w, c = 1, 3, 4, 4, 1
        cand = jnp.stack([jnp.full((b, h, w, c), float(i)) for i in range(k)], axis=1)
        logits = jnp.zeros((b, h, w, k))
        out = pk.composite_fused(cand, logits, interpret=True)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)
