"""VGG / LPIPS perceptual metric plumbing tests (random weights; values are
plumbing-correct, not reference-comparable — real weights gate on .npz)."""

import jax
import numpy as np
import pytest

from video_prediction_tpu.models.lpips import LPIPSMetric
from video_prediction_tpu.models.vgg import VGGMetric


class TestVGGMetric:
    def test_refuses_without_weights(self):
        with pytest.raises(FileNotFoundError):
            VGGMetric(weights_path=None, allow_random=False)

    def test_identity_similarity_is_one(self):
        m = VGGMetric(allow_random=True)
        assert m.untrained
        img = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        sim = np.asarray(m(img, img))
        np.testing.assert_allclose(sim, 1.0, atol=1e-4)

    def test_different_images_less_similar(self):
        m = VGGMetric(allow_random=True)
        a = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
        b = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        assert float(m(a, b)[0]) < float(m(a, a)[0])

    def test_leading_dims_preserved(self):
        m = VGGMetric(allow_random=True)
        a = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 32, 32, 3))
        assert m(a, a).shape == (2, 3)


class TestLPIPS:
    def test_identity_distance_zero(self):
        m = LPIPSMetric(allow_random=True)
        img = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        d = np.asarray(m(img, img))
        np.testing.assert_allclose(d, 0.0, atol=1e-5)

    def test_distance_positive_and_ordered(self):
        m = LPIPSMetric(allow_random=True)
        a = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
        near = a + 0.01
        far = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        d_near = float(m(a, near)[0])
        d_far = float(m(a, far)[0])
        assert 0 < d_near < d_far
