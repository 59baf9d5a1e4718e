"""Generator-variant coverage: flow transformation, action/state
conditioning, where_add placements, GRU cells, bf16 compute."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_prediction_tpu.configs.hparams import ModelHparams
from video_prediction_tpu.models import get_model_class
from video_prediction_tpu.train import create_train_state, make_train_step

B, T, H, W, C = 2, 4, 16, 16, 3


def hp(**kw):
    base = dict(
        context_frames=2, sequence_length=T, ngf=4, ndf=4, nef=8,
        l1_weight=1.0, nz=0, num_transformed_images=2, conv_rnn_norm=False,
        clip_length=3,
    )
    base.update(kw)
    return ModelHparams(**base)


def batch(with_actions=False, with_states=False):
    rng = jax.random.PRNGKey(0)
    out = {"images": jax.random.uniform(rng, (B, T, H, W, C))}
    if with_actions:
        out["actions"] = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 4))
    if with_states:
        out["states"] = jax.random.uniform(jax.random.PRNGKey(2), (B, T, 3))
    return out


class TestTransformations:
    @pytest.mark.parametrize("transformation", ["flow", "dna", "direct", "stp"])
    def test_variant_trains(self, transformation):
        n = 0 if transformation in ("dna", "direct") else 2
        model = get_model_class("savp")(hp(transformation=transformation, num_transformed_images=n))
        b = batch()
        ts = create_train_state(model, jax.random.PRNGKey(0), b)
        step = make_train_step(model, donate=False)
        ts, scalars = step(ts, b)
        assert np.isfinite(float(scalars["g_loss"]))

    def test_kernel_normalization_hparam(self):
        """``kernel_normalization`` plumbs through to the CDNA/DNA heads:
        relu (Finn 2016, reference dna_model.py) vs softmax (SAVP) produce
        different kernels from the same params, and the dna/sna model
        classes default to relu."""
        from video_prediction_tpu.ops import cdna as cdna_ops

        assert get_model_class("dna").default_hparams().kernel_normalization == "relu"
        assert get_model_class("sna").default_hparams().kernel_normalization == "relu"
        assert get_model_class("savp").default_hparams().kernel_normalization == "softmax"
        b = batch()
        outs = {}
        for method in ("softmax", "relu"):
            model = get_model_class("savp")(hp(kernel_normalization=method))
            params, _ = model.init_variables(jax.random.PRNGKey(0), b)
            o = model.generator.apply(
                {"params": params["generator"]},
                b["images"],
                jnp.ones((T - 1, B), bool),
                output_aux=True,
            )
            outs[method] = np.asarray(o["kernels"])
        # both are valid normalizations (sum to 1 over the taps)...
        for method, k in outs.items():
            np.testing.assert_allclose(k.sum(axis=(-3, -2)), 1.0, atol=1e-5)
        # ...but they are different normalizations of the same raw logits
        assert not np.allclose(outs["softmax"], outs["relu"], atol=1e-4)
        # relu zeroes negative taps (up to the stability shift); softmax never does
        assert outs["relu"].min() < outs["softmax"].min()

    def test_flow_outputs_flow_fields(self):
        model = get_model_class("savp")(hp(transformation="flow"))
        b = batch()
        params, _ = model.init_variables(jax.random.PRNGKey(0), b)
        out = model.generator.apply(
            {"params": params["generator"]},
            b["images"],
            jnp.ones((T - 1, B), bool),
            output_aux=True,
        )
        assert "flows" in out
        assert out["flows"].shape == (B, T - 1, H, W, 2, 2)  # [.., 2, n_trans]


class TestConditioning:
    def test_actions_change_predictions(self):
        model = get_model_class("savp")(hp())
        b = batch(with_actions=True)
        params, _ = model.init_variables(jax.random.PRNGKey(0), b)
        step0 = jnp.zeros((), jnp.int32)
        out1 = model.forward(params, b, jax.random.PRNGKey(1), step0, train=False)
        b2 = dict(b)
        b2["actions"] = b["actions"] + 1.0
        out2 = model.forward(params, b2, jax.random.PRNGKey(1), step0, train=False)
        assert not np.allclose(np.asarray(out1["gen_images"]), np.asarray(out2["gen_images"]))

    def test_state_head_and_loss(self):
        model = get_model_class("savp")(hp(use_states=True, state_weight=1e-4))
        b = batch(with_actions=True, with_states=True)
        params, state = model.init_variables(jax.random.PRNGKey(0), b)
        total, aux = model.compute_losses(params, state, b, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32))
        assert "state" in aux["g_losses"]
        assert aux["outputs"]["gen_states"].shape == (B, T - 1, 3)

    def test_state_rollout_gated_by_scheduled_sampling(self):
        """GT states condition the cell exactly where GT images do
        (reference SAVPCell: state = where(ground_truth[t], inputs['states'],
        gen_state)): context-frame states are observable, post-context GT
        states must NOT leak into an autoregressive (eval) rollout."""
        ctx = 2
        model = get_model_class("savp")(hp(use_states=True, state_weight=1e-4))
        b = batch(with_actions=True, with_states=True)
        params, _ = model.init_variables(jax.random.PRNGKey(0), b)
        step0 = jnp.zeros((), jnp.int32)
        out1 = model.forward(params, b, jax.random.PRNGKey(1), step0, train=False)
        b2 = dict(b)
        b2["states"] = b["states"].at[:, ctx:].add(5.0)  # perturb post-context only
        out2 = model.forward(params, b2, jax.random.PRNGKey(1), step0, train=False)
        np.testing.assert_allclose(
            np.asarray(out1["gen_states"]), np.asarray(out2["gen_states"]), atol=1e-6
        )
        # a context-frame state (observable at deployment) DOES condition
        b3 = dict(b)
        b3["states"] = b["states"].at[:, ctx - 1].add(1.0)
        out3 = model.forward(params, b3, jax.random.PRNGKey(1), step0, train=False)
        assert not np.allclose(np.asarray(out1["gen_states"]), np.asarray(out3["gen_states"]))
        b4 = dict(b)
        b4["states"] = b["states"].at[:, 0].add(1.0)  # the initial state too
        out4 = model.forward(params, b4, jax.random.PRNGKey(1), step0, train=False)
        assert not np.allclose(np.asarray(out1["gen_states"]), np.asarray(out4["gen_states"]))


class TestRegimeFormulations:
    def test_scan_unroll_regimes_compute_identical_rollouts(self):
        """scan_unroll=0 selects the fused compositing formulation
        (kernel-slice mask conv + FMA accumulate) and scan_unroll>=1 the
        concat+einsum one (models/savp.py round-3 perf note). Same params
        must produce the same rollout — param trees are identical by
        construction."""
        b = batch()
        m0 = get_model_class("savp")(hp(scan_unroll=0, dependent_mask=True))
        m1 = get_model_class("savp")(hp(scan_unroll=1, dependent_mask=True))
        params, _ = m0.init_variables(jax.random.PRNGKey(0), b)
        step = jnp.zeros((), jnp.int32)
        o0 = m0.forward(params, b, jax.random.PRNGKey(1), step, train=False)
        o1 = m1.forward(params, b, jax.random.PRNGKey(1), step, train=False)
        np.testing.assert_allclose(
            np.array(o0["gen_images"]), np.array(o1["gen_images"]), atol=1e-5
        )

    def test_remat_prevent_cse_same_math(self):
        """remat_prevent_cse=True (the memory-bounded full-unroll regime —
        lets batch>48 compile at scan_unroll=0 where the CSE'd form OOMs
        HBM) is a pure scheduling change: same param tree, same rollout,
        and a train step matches the default numerically."""
        b = batch()
        results = []
        for pcse in (False, True):
            model = get_model_class("savp")(
                hp(scan_unroll=0, dependent_mask=True, remat_prevent_cse=pcse)
            )
            params, _ = model.init_variables(jax.random.PRNGKey(0), b)
            o = model.forward(params, b, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32), train=False)
            ts = create_train_state(model, jax.random.PRNGKey(0), b)
            step = make_train_step(model, donate=False)
            ts, scalars = step(ts, b)
            results.append((np.asarray(o["gen_images"]), float(scalars["g_loss"])))
        np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-5)
        assert results[0][1] == pytest.approx(results[1][1], rel=1e-5)


class TestArchVariants:
    def test_where_add_placements(self):
        for where in ["all", "input", "middle"]:
            model = get_model_class("savp")(hp(nz=4, kl_weight=0.1, where_add=where))
            b = batch()
            params, _ = model.init_variables(jax.random.PRNGKey(0), b)
            out = model.forward(params, b, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32), train=True)
            assert out["gen_images_enc"].shape == (B, T - 1, H, W, C)

    def test_gru_cell(self):
        model = get_model_class("savp")(hp(conv_rnn="gru"))
        b = batch()
        ts = create_train_state(model, jax.random.PRNGKey(0), b)
        step = make_train_step(model, donate=False)
        ts, scalars = step(ts, b)
        assert np.isfinite(float(scalars["g_loss"]))

    def test_bfloat16_compute(self):
        model = get_model_class("savp")(hp(compute_dtype="bfloat16"))
        b = batch()
        ts = create_train_state(model, jax.random.PRNGKey(0), b)
        step = make_train_step(model, donate=False)
        ts, scalars = step(ts, b)
        assert np.isfinite(float(scalars["g_loss"]))
        # params stay fp32
        leaf = jax.tree_util.tree_leaves(ts.params["generator"])[0]
        assert leaf.dtype == jnp.float32

    def test_bfloat16_gate_math(self):
        """gate_dtype="bfloat16" (the r4 HBM-bandwidth lever) changes ONLY
        the ConvLSTM gate math dtype: the param tree is identical to the
        fp32-gate tree (checkpoints interchange), the train step is finite,
        and the fp32 default's numerics stay golden-pinned elsewhere."""
        b = batch()
        m32 = get_model_class("savp")(hp(compute_dtype="bfloat16"))
        m16 = get_model_class("savp")(hp(compute_dtype="bfloat16", gate_dtype="bfloat16"))
        p32, _ = m32.init_variables(jax.random.PRNGKey(0), b)
        p16, _ = m16.init_variables(jax.random.PRNGKey(0), b)
        assert jax.tree_util.tree_structure(p32) == jax.tree_util.tree_structure(p16)
        for a, bb in zip(jax.tree_util.tree_leaves(p32), jax.tree_util.tree_leaves(p16)):
            assert a.shape == bb.shape and a.dtype == bb.dtype
        ts = create_train_state(m16, jax.random.PRNGKey(0), b)
        step = make_train_step(m16, donate=False)
        ts, scalars = step(ts, b)
        assert np.isfinite(float(scalars["g_loss"]))

    def test_deconv_upsample_and_strided_downsample(self):
        model = get_model_class("savp")(
            hp(upsample_layer="deconv2d", downsample_layer="conv2d", norm_layer="layer")
        )
        b = batch()
        ts = create_train_state(model, jax.random.PRNGKey(0), b)
        step = make_train_step(model, donate=False)
        ts, scalars = step(ts, b)
        assert np.isfinite(float(scalars["g_loss"]))


class TestSV2PLatent:
    def test_time_invariant_latent_is_one_z_per_sequence(self):
        """latent_time_invariant (the sv2p model-class default): the
        posterior emits ONE (mu, logvar) per clip, the prior draw is one z
        per sequence (broadcast internally over the T-1 steps), and the
        posterior param tree is identical to the per-step one
        (checkpoints interchange)."""
        assert get_model_class("sv2p").default_hparams().latent_time_invariant
        b = batch()
        m_ti = get_model_class("savp")(hp(nz=4, kl_weight=0.1, latent_time_invariant=True))
        m_ps = get_model_class("savp")(hp(nz=4, kl_weight=0.1))
        p_ti, _ = m_ti.init_variables(jax.random.PRNGKey(0), b)
        p_ps, _ = m_ps.init_variables(jax.random.PRNGKey(0), b)
        assert jax.tree_util.tree_structure(p_ti["posterior"]) == jax.tree_util.tree_structure(
            p_ps["posterior"]
        )
        step0 = jnp.zeros((), jnp.int32)
        out = m_ti.forward(p_ti, b, jax.random.PRNGKey(1), step0, train=True)
        assert out["zs_mu"].shape == (B, 1, 4)
        assert out["zs_logvar"].shape == (B, 1, 4)
        # eval path: the prior draw is sequence-level too
        out_ev = m_ti.forward(p_ti, b, jax.random.PRNGKey(1), step0, train=False)
        assert out_ev["zs_sampled_prior"].shape == (B, 1, 4)
        assert out_ev["gen_images"].shape == (B, T - 1, H, W, C)
        # and it trains
        ts = create_train_state(m_ti, jax.random.PRNGKey(0), b)
        step = make_train_step(m_ti, donate=False)
        ts, scalars = step(ts, b)
        assert np.isfinite(float(scalars["g_loss"]))

    def test_time_invariant_rejects_learn_prior(self):
        with pytest.raises(ValueError, match="latent_time_invariant"):
            get_model_class("savp")(hp(nz=4, latent_time_invariant=True, learn_prior=True))


class TestExtendedLosses:
    def test_z_l1_latent_cycle(self):
        model = get_model_class("savp")(hp(nz=4, kl_weight=0.1, z_l1_weight=0.5))
        b = batch()
        params, state = model.init_variables(jax.random.PRNGKey(0), b)
        total, aux = model.compute_losses(params, state, b, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32))
        assert "z_l1" in aux["g_losses"]
        assert np.isfinite(float(total))

    def test_learn_initial_state_adds_params_and_trains(self):
        model = get_model_class("savp")(hp(learn_initial_state=True))
        b = batch()
        ts = create_train_state(model, jax.random.PRNGKey(0), b)
        names = " ".join(ts.params["generator"].keys())
        assert "init_state_0" in names
        step = make_train_step(model, donate=False)
        ts1, _ = step(ts, b)
        ts2, _ = step(ts1, b)
        # learned init states receive gradients
        a = np.asarray(ts.params["generator"]["init_state_0"])
        c = np.asarray(ts2.params["generator"]["init_state_0"])
        assert not np.allclose(a, c)

    def test_vgg_cdist_requires_weights(self):
        with pytest.raises(FileNotFoundError):
            get_model_class("savp")(hp(vgg_cdist_weight=1.0))


class TestImageDiscriminatorAndPrior:
    def test_image_sn_gan(self):
        model = get_model_class("savp")(hp(image_sn_gan_weight=0.1))
        b = batch()
        params, state = model.init_variables(jax.random.PRNGKey(0), b)
        assert "image" in params["discriminator"]
        total, aux = model.compute_losses(params, state, b, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32))
        assert "image_gan" in aux["g_losses"] and "image_gan_real" in aux["d_losses"]
        assert np.isfinite(float(total))

    def test_both_discriminators(self):
        model = get_model_class("savp")(hp(image_sn_gan_weight=0.1, video_sn_gan_weight=0.1))
        b = batch()
        ts = create_train_state(model, jax.random.PRNGKey(0), b)
        step = make_train_step(model, donate=False)
        ts, scalars = step(ts, b)
        assert "g/image_gan" in scalars and "g/video_gan" in scalars

    def test_learned_prior(self):
        model = get_model_class("savp")(hp(nz=4, kl_weight=0.1, learn_prior=True))
        b = batch()
        params, _ = model.init_variables(jax.random.PRNGKey(0), b)
        # the prior conv net lives INSIDE the generator cell (leak-free
        # conditioning), not as a separate top-level param tree
        assert "prior" not in params
        assert "prior" in params["generator"]["SAVPCell_0"]
        out = model.forward(params, b, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32), train=True)
        assert "prior_mu" in out and out["prior_mu"].shape == (B, T - 1, 4)
        # KL against the learned prior is finite and trains
        ts = create_train_state(model, jax.random.PRNGKey(0), b)
        step = make_train_step(model, donate=False)
        ts, scalars = step(ts, b)
        assert np.isfinite(float(scalars["g/kl"]))

    def test_learned_prior_eval_no_future_frame_leak(self):
        """At eval the learned prior conditions only on frames that exist at
        deployment (context frames / the model's own rollout): perturbing
        post-context ground-truth frames must not change the rollout.
        Mirrors test_state_rollout_gated_by_scheduled_sampling (the r2
        VERDICT's learned-prior leak)."""
        ctx = 2
        model = get_model_class("savp")(hp(nz=4, kl_weight=0.1, learn_prior=True))
        b = batch()
        params, _ = model.init_variables(jax.random.PRNGKey(0), b)
        step0 = jnp.zeros((), jnp.int32)
        out1 = model.forward(params, b, jax.random.PRNGKey(1), step0, train=False)
        b2 = dict(b)
        b2["images"] = b["images"].at[:, ctx:].add(0.25)  # future GT only
        out2 = model.forward(params, b2, jax.random.PRNGKey(1), step0, train=False)
        np.testing.assert_allclose(
            np.asarray(out1["gen_images"]), np.asarray(out2["gen_images"]), atol=1e-6
        )
        # context frames DO condition the prior/rollout
        b3 = dict(b)
        b3["images"] = b["images"].at[:, :ctx].add(0.1)
        out3 = model.forward(params, b3, jax.random.PRNGKey(1), step0, train=False)
        assert not np.allclose(np.asarray(out1["gen_images"]), np.asarray(out3["gen_images"]))

    def test_feature_matching_loss_present(self):
        model = get_model_class("savp")(
            hp(video_sn_gan_weight=0.1, gan_feature_l2_weight=1.0)
        )
        b = batch()
        params, state = model.init_variables(jax.random.PRNGKey(0), b)
        total, aux = model.compute_losses(params, state, b, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32))
        assert "video_gan_feat" in aux["g_losses"]
        assert np.isfinite(float(total))

    def test_scan_unroll(self):
        # unrolled scan must match the rolled scan numerically
        b = batch()
        out = []
        for unroll in (1, 2):
            model = get_model_class("savp")(hp(scan_unroll=unroll))
            params, _ = model.init_variables(jax.random.PRNGKey(0), b)
            o = model.forward(params, b, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32), train=False)
            out.append(np.asarray(o["gen_images"]))
        np.testing.assert_allclose(out[0], out[1], atol=1e-5)

    def test_remat_policy_names_matches_full(self):
        """Selective remat (save annotated conv/rnn outputs) is a pure
        scheduling change: forward AND one train step match the blanket
        policy numerically."""
        b = batch()
        results = []
        for policy in ("full", "names"):
            model = get_model_class("savp")(hp(remat_policy=policy))
            ts = create_train_state(model, jax.random.PRNGKey(0), b)
            step = make_train_step(model, donate=False)
            ts, scalars = step(ts, b)
            leaf = np.asarray(ts.params["generator"]["SAVPCell_0"]["stem"]["Conv_0"]["kernel"])
            results.append((float(scalars["g_loss"]), leaf))
        assert results[0][0] == pytest.approx(results[1][0], rel=1e-6)
        np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-6)

    def test_disc_conv3d_taps_matches_direct(self):
        """``disc_conv3d_taps`` swaps the video-disc conv3d lowering for
        the time-tap summed-conv2d decomposition — same param tree, same
        math; one train step must match the direct form numerically."""
        b = batch()
        results = []
        for taps in (False, True):
            model = get_model_class("savp")(
                hp(video_sn_gan_weight=0.1, disc_conv3d_taps=taps)
            )
            ts = create_train_state(model, jax.random.PRNGKey(0), b)
            step = make_train_step(model, donate=False)
            ts, scalars = step(ts, b)
            results.append((float(scalars["g_loss"]), float(scalars["d_loss"])))
        assert results[0][0] == pytest.approx(results[1][0], abs=1e-5)
        assert results[0][1] == pytest.approx(results[1][1], abs=1e-5)

    def test_context_images_background(self):
        model = get_model_class("savp")(hp(context_images_background=True))
        b = batch()
        ts = create_train_state(model, jax.random.PRNGKey(0), b)
        step = make_train_step(model, donate=False)
        ts, scalars = step(ts, b)
        assert np.isfinite(float(scalars["g_loss"]))
        # context frames become candidates and first_image_background is
        # suppressed (context frame 0 IS the first image): net +ctx-1 masks
        model0 = get_model_class("savp")(hp())
        ts0 = create_train_state(model0, jax.random.PRNGKey(0), b)
        k1 = ts.params["generator"]["SAVPCell_0"]["mask_head"]["Conv_0"]["kernel"].shape[-1]
        k0 = ts0.params["generator"]["SAVPCell_0"]["mask_head"]["Conv_0"]["kernel"].shape[-1]
        assert k1 == k0 + 1  # context_frames == 2
