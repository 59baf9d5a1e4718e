"""Loss and metric unit tests: closed-form values at known inputs, and
SSIM/PSNR cross-checks against independent numpy implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_prediction_tpu import losses, metrics


class TestLosses:
    def test_l1_l2_known_values(self):
        a = jnp.zeros((4,))
        b = jnp.full((4,), 2.0)
        assert float(losses.l1_loss(a, b)) == pytest.approx(2.0)
        assert float(losses.l2_loss(a, b)) == pytest.approx(4.0)

    def test_charbonnier_reduces_to_l1(self):
        a = jnp.zeros((4,))
        b = jnp.full((4,), 3.0)
        assert float(losses.charbonnier_loss(a, b, epsilon=1e-8)) == pytest.approx(3.0, rel=1e-4)

    def test_kl_unit_prior_zero_at_standard_normal(self):
        mu = jnp.zeros((2, 8))
        logvar = jnp.zeros((2, 8))
        assert float(losses.kl_loss(mu, logvar)) == pytest.approx(0.0, abs=1e-6)

    def test_kl_closed_form(self):
        # KL(N(1, 1) || N(0,1)) = 0.5 per dim
        mu = jnp.ones((1, 4))
        logvar = jnp.zeros((1, 4))
        assert float(losses.kl_loss(mu, logvar)) == pytest.approx(2.0, rel=1e-5)

    def test_kl_two_gaussians_symmetric_zero(self):
        mu = jnp.ones((3, 5)) * 0.3
        logvar = jnp.ones((3, 5)) * -0.2
        assert float(losses.kl_loss(mu, logvar, mu, logvar)) == pytest.approx(0.0, abs=1e-6)

    def test_lsgan_values(self):
        logits = jnp.array([0.0, 1.0])
        assert float(losses.gan_loss(logits, 1.0, "LSGAN")) == pytest.approx(0.5)
        assert float(losses.gan_loss(logits, 0.0, "LSGAN")) == pytest.approx(0.5)

    def test_gan_sigmoid_ce(self):
        logits = jnp.array([0.0])
        # CE at logit 0 = log(2) for either label
        expected = float(np.log(2.0))
        assert float(losses.gan_loss(logits, 1.0, "GAN")) == pytest.approx(expected, rel=1e-5)
        assert float(losses.gan_loss(logits, 0.0, "GAN")) == pytest.approx(expected, rel=1e-5)

    def test_gan_soft_labels_route_through_sigmoid_kl(self):
        """One-sided label smoothing: a non-{0,1} label on the "GAN" type
        dispatches to sigmoid_kl_with_logits (reference gan_loss routing) —
        zero at the fixed point, and equal to its mean everywhere."""
        t = 0.9
        logit = float(np.log(t / (1 - t)))
        assert float(losses.gan_loss(jnp.full((4,), logit), t, "GAN")) == pytest.approx(0.0, abs=1e-6)
        logits = jnp.array([-2.0, 0.0, 3.0])
        expected = float(np.mean(np.asarray(losses.sigmoid_kl_with_logits(logits, t))))
        assert float(losses.gan_loss(logits, t, "GAN")) == pytest.approx(expected, rel=1e-6)

    def test_hinge(self):
        logits = jnp.array([2.0])
        assert float(losses.gan_loss(logits, 1.0, "hinge")) == pytest.approx(0.0)
        assert float(losses.gan_loss(logits, 0.0, "hinge")) == pytest.approx(3.0)

    def test_feature_matching(self):
        f1 = [jnp.ones((2, 3)), jnp.zeros((2, 3))]
        f2 = [jnp.zeros((2, 3)), jnp.zeros((2, 3))]
        assert float(losses.feature_matching_loss(f1, f2, "l2")) == pytest.approx(0.5)

    def test_sigmoid_kl_with_logits(self):
        # zero at the fixed point: sigmoid(logit(t)) == t -> KL == 0
        t = 0.9
        logit = float(np.log(t / (1 - t)))
        out = losses.sigmoid_kl_with_logits(jnp.full((4,), logit), t)
        assert out.shape == (4,)  # element-wise, caller reduces
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
        # equals sigmoid-CE minus target entropy everywhere
        logits = jnp.array([-2.0, 0.0, 3.0])
        ce = np.maximum(np.asarray(logits), 0) - np.asarray(logits) * t + np.log1p(
            np.exp(-np.abs(np.asarray(logits)))
        )
        entropy = -t * np.log(t) - (1 - t) * np.log(1 - t)
        np.testing.assert_allclose(
            np.asarray(losses.sigmoid_kl_with_logits(logits, t)), ce - entropy, rtol=1e-6
        )
        # hard labels reduce to plain sigmoid cross-entropy (softplus form)
        np.testing.assert_allclose(
            np.asarray(losses.sigmoid_kl_with_logits(logits, 1.0)),
            np.log1p(np.exp(-np.asarray(logits))),
            rtol=1e-6,
        )


def _numpy_ssim(x, y, max_val=1.0, size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Independent SSIM implementation (direct convolution, VALID)."""
    from scipy.ndimage import correlate

    coords = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    kern = np.outer(g, g)

    def filt(img):
        # VALID correlation per channel
        out = np.stack(
            [correlate(img[..., ch], kern, mode="constant")[5:-5, 5:-5] for ch in range(img.shape[-1])],
            axis=-1,
        )
        return out

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_x, mu_y = filt(x), filt(y)
    sxx = filt(x * x) - mu_x**2
    syy = filt(y * y) - mu_y**2
    sxy = filt(x * y) - mu_x * mu_y
    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / ((mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2))
    return ssim_map.mean()


class TestMetrics:
    def test_psnr_known_value(self):
        true = jnp.zeros((1, 8, 8, 1))
        pred = jnp.full((1, 8, 8, 1), 0.1)
        # mse = 0.01 -> psnr = 20 dB
        assert float(metrics.peak_signal_to_noise_ratio(true, pred)[0]) == pytest.approx(20.0, rel=1e-4)

    def test_psnr_leading_dims(self):
        true = jnp.zeros((2, 3, 8, 8, 1))
        pred = jnp.full((2, 3, 8, 8, 1), 0.1)
        out = metrics.peak_signal_to_noise_ratio(true, pred)
        assert out.shape == (2, 3)

    def test_ssim_identical_is_one(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        out = metrics.structural_similarity(img, img)
        np.testing.assert_allclose(np.array(out), 1.0, atol=1e-5)

    def test_ssim_matches_numpy(self):
        pytest.importorskip("scipy")
        rng = np.random.RandomState(0)
        x = rng.rand(32, 32, 2).astype(np.float32)
        y = np.clip(x + rng.randn(32, 32, 2).astype(np.float32) * 0.05, 0, 1)
        ours = float(metrics.structural_similarity(jnp.asarray(x), jnp.asarray(y)))
        ref = _numpy_ssim(x, y)
        assert ours == pytest.approx(ref, rel=1e-3)

    def test_ssim_matches_tf(self):
        tf = pytest.importorskip("tensorflow")
        rng = np.random.RandomState(1)
        x = rng.rand(2, 40, 40, 3).astype(np.float32)
        y = np.clip(x + rng.randn(2, 40, 40, 3).astype(np.float32) * 0.1, 0, 1)
        ours = np.array(metrics.structural_similarity(jnp.asarray(x), jnp.asarray(y)))
        ref = tf.image.ssim(tf.constant(x), tf.constant(y), max_val=1.0).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_cosine_similarity(self):
        x = jnp.array([[1.0, 0.0]])
        y = jnp.array([[0.0, 1.0]])
        assert float(metrics.cosine_similarity(x, x)[0]) == pytest.approx(1.0)
        assert float(metrics.cosine_similarity(x, y)[0]) == pytest.approx(0.0, abs=1e-6)
