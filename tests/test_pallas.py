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
