"""Unit tests for primitive ops: layers, spectral norm, ConvRNN cells,
CDNA/DNA kernel application (vs naive loops), and flow warping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_prediction_tpu import ops


class TestLayers:
    def test_conv2d_shape(self):
        m = ops.Conv2D(features=8, kernel_size=3, strides=2)
        x = jnp.ones((2, 16, 16, 3))
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (2, 8, 8, 8)

    def test_upsample_nearest_exact(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        y = ops.layers.upsample2d(x, 2, "nearest")
        assert y.shape == (1, 4, 4, 1)
        np.testing.assert_allclose(y[0, :2, :2, 0], np.full((2, 2), 0.0))
        np.testing.assert_allclose(y[0, 2:, 2:, 0], np.full((2, 2), 3.0))

    def test_upsample_conv(self):
        m = ops.UpsampleConv2D(features=4, scale=2)
        x = jnp.ones((1, 8, 8, 2))
        params = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(params, x).shape == (1, 16, 16, 4)

    def test_conv_pool(self):
        m = ops.ConvPool2D(features=4)
        x = jnp.ones((1, 8, 8, 2))
        params = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(params, x).shape == (1, 4, 4, 4)

    def test_norm_registry(self):
        for name in ["instance", "layer", "none"]:
            layer = ops.get_norm_layer(name)()
            x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
            params = layer.init(jax.random.PRNGKey(1), x)
            y = layer.apply(params, x)
            assert y.shape == x.shape
        with pytest.raises(ValueError):
            ops.get_norm_layer("bogus")

    def test_instance_norm_statistics(self):
        # instance norm: per-sample per-channel spatial stats ~ (0, 1)
        layer = ops.get_norm_layer("instance")()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3)) * 5 + 2
        params = layer.init(jax.random.PRNGKey(1), x)
        y = layer.apply(params, x)
        means = np.array(y).mean(axis=(1, 2))
        stds = np.array(y).std(axis=(1, 2))
        np.testing.assert_allclose(means, 0.0, atol=1e-4)
        np.testing.assert_allclose(stds, 1.0, atol=1e-2)

    def test_registries_raise(self):
        with pytest.raises(ValueError):
            ops.get_upsample_layer("nope")
        with pytest.raises(ValueError):
            ops.get_downsample_layer("nope")
        with pytest.raises(ValueError):
            ops.layers.get_activation("nope")


class TestSpectralNorm:
    def test_power_iteration_converges_to_sigma(self):
        # after many iterations, sigma estimate ~= top singular value
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
        u = jnp.asarray(rng.randn(16).astype(np.float32))
        u = u / np.linalg.norm(u)
        for _ in range(50):
            _, u, sigma = ops.spectral_normalize(w, u)
        true_sigma = np.linalg.svd(np.array(w), compute_uv=False)[0]
        np.testing.assert_allclose(float(sigma), true_sigma, rtol=1e-3)

    def test_sn_conv_updates_u_only_when_mutable(self):
        m = ops.SpectralConv2D(features=8)
        x = jnp.ones((2, 8, 8, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        assert "spectral" in variables
        y, new_vars = m.apply(variables, x, mutable=["spectral"])
        assert y.shape == (2, 8, 8, 8)
        u0 = variables["spectral"]
        u1 = new_vars["spectral"]
        leaf0 = jax.tree_util.tree_leaves(u0)[0]
        leaf1 = jax.tree_util.tree_leaves(u1)[0]
        assert not np.allclose(leaf0, leaf1)
        # immutable apply: no state change, same output shape
        y2 = m.apply(variables, x)
        assert y2.shape == y.shape

    def test_sn_bounds_spectral_norm(self):
        # after normalization the effective kernel has sigma <= ~1
        m = ops.SpectralDense(features=8, use_bias=False)
        x = jnp.eye(16)
        variables = m.init(jax.random.PRNGKey(0), x)
        # run a few mutable passes to converge u
        for _ in range(20):
            y, variables_new = m.apply(variables, x, mutable=["spectral"])
            variables = {**variables, **variables_new}
        w_eff = np.array(y)  # y = W_bar since x = I
        sigma = np.linalg.svd(w_eff, compute_uv=False)[0]
        assert sigma < 1.05

    def test_sn_conv3d(self):
        m = ops.SpectralConv3D(features=4, strides=(1, 2, 2))
        x = jnp.ones((2, 4, 8, 8, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(variables, x)
        assert y.shape == (2, 4, 4, 4, 4)

    def test_conv3d_time_tap_decomposition_matches_direct(self):
        """The batched-2D time-tap formulation (ops/spectral.py) must equal
        lax's direct 3-D convolution for every stride/kernel combo the
        discriminators use."""
        from video_prediction_tpu.ops.spectral import _conv3d_as_time_taps

        rng = jax.random.PRNGKey(3)
        for kt, st, t in [(3, 1, 10), (3, 2, 10), (1, 1, 5), (3, 2, 5), (2, 2, 6)]:
            kx, kw_ = jax.random.split(jax.random.fold_in(rng, kt * 100 + st * 10 + t))
            x = jax.random.normal(kx, (2, t, 6, 6, 3))
            w = jax.random.normal(kw_, (kt, 4, 4, 3, 5))
            for strides in [(st, 1, 1), (st, 2, 2)]:
                direct = jax.lax.conv_general_dilated(
                    x, w, strides, "SAME", dimension_numbers=("NTHWC", "THWIO", "NTHWC")
                )
                taps = _conv3d_as_time_taps(x, w, strides, "SAME")
                np.testing.assert_allclose(np.array(taps), np.array(direct), atol=2e-4)


class TestConvRNN:
    def test_convlstm_shapes_and_carry(self):
        cell = ops.ConvLSTMCell(features=8)
        x = jnp.ones((2, 8, 8, 4))
        carry = cell.initialize_carry(2, (8, 8))
        params = cell.init(jax.random.PRNGKey(0), carry, x)
        (c, h), y = cell.apply(params, carry, x)
        assert c.shape == h.shape == y.shape == (2, 8, 8, 8)
        np.testing.assert_allclose(np.array(h), np.array(y))

    def test_convlstm_split_gate_conv_matches_merged(self):
        """gate_conv='split' (separate x/h convs) computes the same cell as
        'merged' when the split kernels are the concatenation-slices of the
        merged kernel — the two layouts are the same math, different param
        trees (ops/rnn.py round-3 perf note)."""
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 5, 4))
        c0 = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 3))
        h0 = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 5, 3))
        merged = ops.ConvLSTMCell(features=3, kernel_size=3, gate_conv="merged")
        pm = merged.init(jax.random.PRNGKey(9), (c0, h0), x)
        km = pm["params"]["gates"]["kernel"]  # [3,3,4+3,12]
        ps = {
            "params": {
                "gates_x": {"kernel": km[:, :, :4], "bias": pm["params"]["gates"]["bias"]},
                "gates_h": {"kernel": km[:, :, 4:]},
            }
        }
        split = ops.ConvLSTMCell(features=3, kernel_size=3, gate_conv="split")
        (cm, hm), _ = merged.apply(pm, (c0, h0), x)
        (cs, hs), _ = split.apply(ps, (c0, h0), x)
        np.testing.assert_allclose(np.array(cs), np.array(cm), atol=1e-5)
        np.testing.assert_allclose(np.array(hs), np.array(hm), atol=1e-5)

    def test_convlstm_norm_variant(self):
        cell = ops.ConvLSTMCell(features=4, use_norm=True)
        x = jnp.ones((1, 4, 4, 2))
        carry = cell.initialize_carry(1, (4, 4))
        params = cell.init(jax.random.PRNGKey(0), carry, x)
        (_, h), _ = cell.apply(params, carry, x)
        assert h.shape == (1, 4, 4, 4)

    def test_convlstm_matches_manual_equations(self):
        # Cross-check the cell against hand-rolled LSTM equations. The
        # equations below read the merged "gates" param (the split layout
        # is covered by the equivalence test above).
        cell = ops.ConvLSTMCell(features=3, kernel_size=3, gate_conv="merged")
        rng = jax.random.PRNGKey(42)
        x = jax.random.normal(rng, (2, 5, 5, 4))
        c0 = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 3))
        h0 = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 5, 3))
        params = cell.init(jax.random.PRNGKey(0), (c0, h0), x)
        (c1, h1), _ = cell.apply(params, (c0, h0), x)

        p = params["params"]

        def conv(inp, kernel, bias=None):
            out = jax.lax.conv_general_dilated(
                inp, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            if bias is not None:
                out = out + bias
            return out

        z = conv(
            np.concatenate([np.array(x), np.array(h0)], axis=-1),
            p["gates"]["kernel"],
            p["gates"]["bias"],
        )
        i, f, g, o = np.split(np.array(z), 4, axis=-1)
        sig = lambda v: 1.0 / (1.0 + np.exp(-v))
        c_ref = sig(f + 1.0) * np.array(c0) + sig(i) * np.tanh(g)
        h_ref = sig(o) * np.tanh(c_ref)
        np.testing.assert_allclose(np.array(c1), c_ref, atol=1e-4)
        np.testing.assert_allclose(np.array(h1), h_ref, atol=1e-4)

    def test_convgru(self):
        cell = ops.ConvGRUCell(features=6)
        x = jnp.ones((2, 8, 8, 3))
        carry = cell.initialize_carry(2, (8, 8))
        params = cell.init(jax.random.PRNGKey(0), carry, x)
        h, y = cell.apply(params, carry, x)
        assert h.shape == (2, 8, 8, 6)
        np.testing.assert_allclose(np.array(h), np.array(y))


def _naive_cdna(image, kernels):
    """Per-sample conv via explicit padding + loops (the ground truth)."""
    b, h, w, c = image.shape
    _, kh, kw, n = kernels.shape
    ph, pw = kh // 2, kw // 2
    padded = np.pad(np.array(image), ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = np.zeros((b, n, h, w, c), np.float32)
    for bi in range(b):
        for ni in range(n):
            k = np.array(kernels)[bi, :, :, ni]
            for y in range(h):
                for x in range(w):
                    patch = padded[bi, y : y + kh, x : x + kw, :]
                    out[bi, ni, y, x, :] = np.tensordot(k, patch, axes=([0, 1], [0, 1]))
    return out


class TestCDNA:
    def test_identity_kernel_reproduces_image(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
        k = ops.identity_kernel(5)
        kernels = jnp.tile(k[None, :, :, None], (2, 1, 1, 1))
        out = ops.apply_cdna_kernels(img, kernels)
        assert out.shape == (2, 1, 8, 8, 3)
        np.testing.assert_allclose(np.array(out[:, 0]), np.array(img), atol=1e-6)

    def test_cdna_matches_naive_loop(self):
        rng = jax.random.PRNGKey(3)
        img = jax.random.uniform(rng, (2, 6, 7, 3))
        kernels = jax.random.uniform(jax.random.PRNGKey(4), (2, 3, 3, 4))
        kernels = ops.normalize_kernels(kernels, "softmax")
        out = ops.apply_cdna_kernels(img, kernels)
        ref = _naive_cdna(img, kernels)
        np.testing.assert_allclose(np.array(out), ref, atol=1e-5)

    def test_dna_matches_naive(self):
        b, h, w, c, kk, n = 2, 5, 5, 2, 3, 2
        img = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, c))
        kernels = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, kk, kk, n))
        kernels = kernels / jnp.sum(kernels, axis=(3, 4), keepdims=True)
        out = ops.apply_dna_kernels(img, kernels)
        assert out.shape == (b, n, h, w, c)
        # naive
        ph = kk // 2
        padded = np.pad(np.array(img), ((0, 0), (ph, ph), (ph, ph), (0, 0)))
        ref = np.zeros((b, n, h, w, c), np.float32)
        kn = np.array(kernels)
        for bi in range(b):
            for ni in range(n):
                for y in range(h):
                    for x in range(w):
                        patch = padded[bi, y : y + kk, x : x + kk, :]
                        ref[bi, ni, y, x] = np.tensordot(kn[bi, y, x, :, :, ni], patch, axes=([0, 1], [0, 1]))
        np.testing.assert_allclose(np.array(out), ref, atol=1e-5)

    def test_normalize_kernels_sums_to_one(self):
        kernels = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 5, 4))
        for method in ["softmax", "relu"]:
            nk = ops.normalize_kernels(kernels, method)
            sums = np.array(jnp.sum(nk, axis=(1, 2)))
            np.testing.assert_allclose(sums, 1.0, atol=1e-5)

    def test_apply_kernels_dispatch(self):
        img = jnp.ones((1, 4, 4, 1))
        cdna = jnp.ones((1, 3, 3, 2)) / 9.0
        dna = jnp.ones((1, 4, 4, 3, 3, 1)) / 9.0
        assert ops.cdna.apply_kernels(img, cdna).shape == (1, 2, 4, 4, 1)
        assert ops.cdna.apply_kernels(img, dna).shape == (1, 1, 4, 4, 1)


class TestWarp:
    def test_zero_flow_is_identity(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
        flow = jnp.zeros((2, 8, 8, 2))
        out = ops.image_warp(img, flow)
        np.testing.assert_allclose(np.array(out), np.array(img), atol=1e-6)

    def test_integer_shift(self):
        img = jnp.arange(16.0).reshape(1, 4, 4, 1)
        # flow of (dy=1, dx=0) means output[y,x] = image[y-1, x]
        flow = jnp.ones((1, 4, 4, 2)) * jnp.array([1.0, 0.0])
        out = np.array(ops.image_warp(img, flow))[0, :, :, 0]
        ref = np.array(img)[0, :, :, 0]
        np.testing.assert_allclose(out[1:], ref[:-1], atol=1e-5)

    def test_subpixel_interpolation(self):
        img = jnp.arange(4.0).reshape(1, 1, 4, 1)
        img = jnp.tile(img, (1, 4, 1, 1))
        flow = jnp.ones((1, 4, 4, 2)) * jnp.array([0.0, 0.5])
        out = np.array(ops.image_warp(img, flow))[0, 0, :, 0]
        # out[x] = img[x - 0.5] = 0.5*(img[x-1]+img[x]) for interior
        np.testing.assert_allclose(out[1:], [0.5, 1.5, 2.5], atol=1e-5)


class TestLocal2D:
    def test_matches_naive_loop(self):
        rng = np.random.RandomState(0)
        b, h, w, cin, cout, k = 2, 5, 4, 3, 2, 3
        x = rng.rand(b, h, w, cin).astype(np.float32)
        weights = rng.rand(h, w, k, k, cin, cout).astype(np.float32)
        bias = rng.rand(cout).astype(np.float32)
        out = np.array(ops.local2d_apply(jnp.asarray(x), jnp.asarray(weights), jnp.asarray(bias)))

        pad = k // 2
        xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        for bb in range(b):
            for y in range(h):
                for xx in range(w):
                    patch = xp[bb, y : y + k, xx : xx + k]  # [k,k,cin]
                    expect = np.einsum("ijc,ijcd->d", patch, weights[y, xx]) + bias
                    np.testing.assert_allclose(out[bb, y, xx], expect, atol=1e-4)

    def test_module_shapes_and_grads(self):
        m = ops.Local2D(features=4, kernel_size=3)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 6, 6, 3))
        params = m.init(jax.random.PRNGKey(1), x)
        assert params["params"]["kernel"].shape == (6, 6, 3, 3, 3, 4)
        out = m.apply(params, x)
        assert out.shape == (2, 6, 6, 4)

        g = jax.grad(lambda p: jnp.sum(jnp.square(m.apply(p, x))))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestSeparableLocal2D:
    def test_matches_composed_dense_kernel(self):
        """Rank-R separable per-pixel kernels must equal the dense local2d
        with the composed kernel K[i,j] = sum_r v[i,r]*h[j,r], depthwise."""
        rng = np.random.RandomState(0)
        b, h, w, c, k, r = 2, 5, 4, 3, 3, 2
        x = rng.rand(b, h, w, c).astype(np.float32)
        v = rng.rand(h, w, k, r, c).astype(np.float32)
        hk = rng.rand(h, w, k, r, c).astype(np.float32)
        bias = rng.rand(c).astype(np.float32)
        out = np.array(
            ops.separable_local2d_apply(
                jnp.asarray(x), jnp.asarray(v), jnp.asarray(hk), jnp.asarray(bias)
            )
        )

        pad = k // 2
        xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        composed = np.einsum("hwirc,hwjrc->hwijc", v, hk)  # [H,W,k,k,C]
        for bb in range(b):
            for y in range(h):
                for xx in range(w):
                    patch = xp[bb, y : y + k, xx : xx + k]  # [k,k,C]
                    expect = np.einsum("ijc,ijc->c", patch, composed[y, xx]) + bias
                    np.testing.assert_allclose(out[bb, y, xx], expect, atol=1e-4)

    def test_module_shapes_and_grads(self):
        m = ops.SeparableLocal2D(kernel_size=3, rank=2)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 6, 6, 3))
        params = m.init(jax.random.PRNGKey(1), x)
        assert params["params"]["vertical"].shape == (6, 6, 3, 2, 3)
        assert params["params"]["horizontal"].shape == (6, 6, 3, 2, 3)
        out = m.apply(params, x)
        assert out.shape == x.shape

        g = jax.grad(lambda p: jnp.sum(jnp.square(m.apply(p, x))))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestAffineWarp:
    def test_zero_params_is_identity(self):
        # params are deltas from the identity transform
        img = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
        params = jnp.zeros((2, 3, 6))
        out = ops.apply_affine_kernels(img, params)
        assert out.shape == (2, 3, 8, 8, 3)
        for i in range(3):
            np.testing.assert_allclose(np.array(out[:, i]), np.array(img), atol=1e-5)

    def test_translation_matches_naive_shift(self):
        # tx delta of 2/(W-1) in normalized coords = source shifted +1 px in x:
        # output[y, x] = image[y, x+1] for interior columns
        w = 8
        img = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w, 1)
        img = jnp.tile(img, (1, w, 1, 1))
        params = jnp.zeros((1, 1, 6)).at[0, 0, 2].set(2.0 / (w - 1))
        out = np.array(ops.apply_affine_kernels(img, params))[0, 0, 0, :, 0]
        ref = np.array(img)[0, 0, :, 0]
        np.testing.assert_allclose(out[:-1], ref[1:], atol=1e-4)

    def test_scale_matches_naive_resample(self):
        # 2x zoom-out (theta diag 2): sample coords run [-2, 2]; compare the
        # transformer against a naive per-pixel bilinear loop
        rng = np.random.RandomState(0)
        img = rng.rand(1, 6, 6, 2).astype(np.float32)
        delta = np.zeros((1, 2, 6), np.float32)
        delta[0, 0, 0] = 1.0  # a11 = 2
        delta[0, 0, 4] = 1.0  # a22 = 2
        delta[0, 1, 2] = 0.3  # second transform: small x translation
        delta[0, 1, 5] = -0.2  # and y translation
        out = np.array(ops.apply_affine_kernels(jnp.asarray(img), jnp.asarray(delta)))

        h = w = 6
        identity = np.array([1.0, 0, 0, 0, 1.0, 0], np.float32)
        for n in range(2):
            theta = (delta[0, n] + identity).reshape(2, 3)
            for y in range(h):
                for x in range(w):
                    xt = 2.0 * x / (w - 1) - 1.0
                    yt = 2.0 * y / (h - 1) - 1.0
                    xs, ys = theta @ np.array([xt, yt, 1.0])
                    qx = np.clip((xs + 1.0) * (w - 1) / 2.0, 0, w - 1)
                    qy = np.clip((ys + 1.0) * (h - 1) / 2.0, 0, h - 1)
                    x0, y0 = int(np.floor(qx)), int(np.floor(qy))
                    x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
                    wx, wy = qx - x0, qy - y0
                    expect = (
                        img[0, y0, x0] * (1 - wx) * (1 - wy)
                        + img[0, y0, x1] * wx * (1 - wy)
                        + img[0, y1, x0] * (1 - wx) * wy
                        + img[0, y1, x1] * wx * wy
                    )
                    np.testing.assert_allclose(out[0, n, y, x], expect, atol=1e-4)

    def test_affine_gradients_finite_nonzero(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 8, 2))
        params = jnp.full((1, 2, 6), 0.05)

        def loss(p):
            return jnp.sum(jnp.square(ops.apply_affine_kernels(img, p)))

        g = jax.grad(loss)(params)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestWarpGradients:
    def test_flow_gradients_finite_nonzero(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 8, 2))
        flow = jnp.ones((1, 8, 8, 2)) * 0.3

        def loss(flow):
            return jnp.sum(jnp.square(ops.image_warp(img, flow)))

        g = jax.grad(loss)(flow)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0
