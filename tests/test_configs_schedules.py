"""Tests for the hparams system and training schedules."""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from video_prediction_tpu.configs.hparams import (
    DatasetHparams,
    ModelHparams,
    apply_overrides,
    load_hparams_json,
    parse_overrides,
)
from video_prediction_tpu.train import schedules

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestOverrides:
    def test_parse_scalars(self):
        out = parse_overrides("lr=0.001,nz=8,norm_layer=instance,learn_prior=True")
        assert out == {"lr": 0.001, "nz": 8, "norm_layer": "instance", "learn_prior": True}

    def test_parse_lists(self):
        out = parse_overrides("decay_steps=[100, 200],kl_anneal_steps=(1,2)")
        assert out["decay_steps"] == [100, 200]
        assert out["kl_anneal_steps"] == (1, 2)

    def test_apply_with_coercion(self):
        hp = apply_overrides(ModelHparams(), {"decay_steps": [10, 20], "lr": 1, "nz": 4})
        assert hp.decay_steps == (10, 20)
        assert hp.lr == 1.0
        assert hp.nz == 4

    def test_unknown_key_raises(self):
        with pytest.raises(ValueError, match="unknown hparam"):
            apply_overrides(ModelHparams(), {"bogus_key": 1})

    def test_malformed_override_raises(self):
        with pytest.raises(ValueError, match="key=value"):
            parse_overrides("just_a_word")

    def test_empty_string(self):
        assert parse_overrides("") == {}


class TestInferenceDefaults:
    """evaluate.py/generate.py adopt the measured inference operating
    point (full time-loop unroll — ~25% faster, numerics-neutral) on
    restored hparams unless the user pinned scan_unroll explicitly."""

    def test_adopts_full_unroll(self):
        from video_prediction_tpu.configs.hparams import adopt_inference_defaults

        hp = ModelHparams(scan_unroll=1)
        assert adopt_inference_defaults(hp, {}).scan_unroll == 0

    def test_user_override_wins(self):
        from video_prediction_tpu.configs.hparams import adopt_inference_defaults

        hp = ModelHparams(scan_unroll=2)
        assert adopt_inference_defaults(hp, {"scan_unroll": 2}).scan_unroll == 2

    def test_gate_dtype_untouched(self):
        from video_prediction_tpu.configs.hparams import adopt_inference_defaults

        hp = ModelHparams(gate_dtype="float32")
        assert adopt_inference_defaults(hp, {}).gate_dtype == "float32"


class TestEnumValidation:
    """Unknown enum-valued hparams must raise at construction, not fall
    back silently (a gate_dtype typo would quietly run fp32 gates and
    poison an A/B probe — r4 advisor finding)."""

    @pytest.mark.parametrize(
        "field,bad",
        [
            ("gate_dtype", "bf16"),
            ("compute_dtype", "bfloat"),
            ("lstm_gate_conv", "fused"),
            ("gan_loss_type", "lsgan"),
            ("schedule_sampling", "sigmoid"),
            ("transformation", "CDNA"),
            ("where_add", "everywhere"),
            ("kl_anneal", "cosine"),
            ("remat_policy", "selective"),
            ("conv_rnn", "rnn"),
            ("kernel_normalization", "norm"),
        ],
    )
    def test_bad_value_raises(self, field, bad):
        with pytest.raises(ValueError, match=field):
            ModelHparams(**{field: bad})
        with pytest.raises(ValueError, match=field):
            ModelHparams().replace(**{field: bad})

    def test_good_values_pass(self):
        hp = ModelHparams(gate_dtype="bfloat16", compute_dtype="bfloat16",
                          lstm_gate_conv="merged", gan_loss_type="hinge",
                          schedule_sampling="always", transformation="flow",
                          where_add="middle", kl_anneal="sigmoid",
                          remat_policy="names", conv_rnn="gru",
                          kernel_normalization="relu")
        assert hp.to_dict()["gate_dtype"] == "bfloat16"


class TestZoo:
    def test_all_zoo_files_parse_against_model_hparams(self):
        files = glob.glob(os.path.join(REPO, "hparams", "*", "*", "model_hparams.json"))
        assert len(files) >= 10, f"zoo incomplete: {files}"
        for f in files:
            hp = apply_overrides(ModelHparams(), load_hparams_json(f))
            assert isinstance(hp, ModelHparams)

    def test_action_free_datasets_have_matching_variant_surface(self):
        """something/ mirrors the other action-free dataset's variant set
        (r3 VERDICT next #7): deterministic, vae, gan, savp all present."""
        for variant in ("ours_deterministic_l1", "ours_vae_l1", "ours_gan", "ours_savp"):
            f = os.path.join(REPO, "hparams", "something", variant, "model_hparams.json")
            assert os.path.exists(f), f
            apply_overrides(ModelHparams(), load_hparams_json(f))

    def test_savp_variant_is_vae_gan(self):
        f = os.path.join(REPO, "hparams", "bair_action_free", "ours_savp", "model_hparams.json")
        hp = apply_overrides(ModelHparams(), load_hparams_json(f))
        assert hp.nz > 0 and hp.kl_weight > 0
        assert hp.video_sn_gan_weight > 0 and hp.video_sn_vae_gan_weight > 0

    def test_gate_conv_default_is_checkpoint_compatible(self):
        # Run dirs written before lstm_gate_conv existed saved a
        # model_hparams.json WITHOUT the key but hold split-layout param
        # trees; changing this default silently makes every one of those
        # checkpoints unrestorable (evaluate.py rebuilds the model from
        # the saved json + defaults). If you change it, ship a param-tree
        # migration in train/checkpoint.py first.
        assert ModelHparams().lstm_gate_conv == "split"


class TestSchedules:
    def test_lr_decay_endpoints(self):
        hp = ModelHparams(lr=1e-3, end_lr=0.0, decay_steps=(100, 200))
        assert float(schedules.learning_rate(jnp.asarray(0), hp)) == pytest.approx(1e-3)
        assert float(schedules.learning_rate(jnp.asarray(150), hp)) == pytest.approx(5e-4)
        assert float(schedules.learning_rate(jnp.asarray(1000), hp)) == pytest.approx(0.0)

    def test_kl_anneal_linear(self):
        hp = ModelHparams(kl_anneal="linear", kl_anneal_steps=(10, 20))
        assert float(schedules.kl_weight(jnp.asarray(10), hp)) == pytest.approx(0.0)
        assert float(schedules.kl_weight(jnp.asarray(15), hp)) == pytest.approx(0.5)
        assert float(schedules.kl_weight(jnp.asarray(30), hp)) == pytest.approx(1.0)

    def test_inverse_sigmoid_decay(self):
        hp = ModelHparams(schedule_sampling="inverse_sigmoid", schedule_sampling_k=900.0)
        p0 = float(schedules.ground_truth_prob(jnp.asarray(0), hp))
        p_mid = float(schedules.ground_truth_prob(jnp.asarray(10000), hp))
        p_late = float(schedules.ground_truth_prob(jnp.asarray(100000), hp))
        # Bengio et al. inverse sigmoid: k/(k+exp(i/k)) starts near 1
        assert p0 == pytest.approx(900.0 / 901.0, abs=1e-3)
        assert p0 > p_mid > p_late
        assert p_late < 1e-4

    def test_use_gt_mask_context_always_true(self):
        import jax

        hp = ModelHparams(context_frames=2, schedule_sampling="inverse_sigmoid")
        mask = schedules.sample_use_gt_mask(jax.random.PRNGKey(0), jnp.asarray(10**6), 4, 12, hp, True)
        assert mask.shape == (11, 4)
        assert bool(mask[:2].all())  # context inputs always ground truth
        assert not bool(mask[2:].any())  # huge step -> fully autoregressive

    def test_use_gt_mask_eval_is_context_only(self):
        import jax

        hp = ModelHparams(context_frames=3, schedule_sampling="inverse_sigmoid")
        mask = schedules.sample_use_gt_mask(jax.random.PRNGKey(0), jnp.asarray(0), 2, 10, hp, False)
        assert bool(mask[:3].all()) and not bool(mask[3:].any())

    def test_use_gt_mask_exact_count(self):
        """schedule_sampling_exact draws EXACTLY round(p*B) ground-truth
        samples per non-context timestep (reference ``scheduled_sample``
        shuffle-and-take semantics), at any step along the schedule."""
        import jax
        import numpy as np

        B = 16
        hp = ModelHparams(
            context_frames=2,
            schedule_sampling="inverse_sigmoid",
            schedule_sampling_k=900.0,
            schedule_sampling_exact=True,
        )
        for step in (0, 2000, 5000, 10**6):
            p = float(schedules.ground_truth_prob(jnp.asarray(step), hp))
            mask = schedules.sample_use_gt_mask(
                jax.random.PRNGKey(step), jnp.asarray(step), B, 12, hp, True
            )
            counts = np.asarray(mask[2:]).sum(axis=1)  # per-timestep GT count
            assert (counts == round(p * B)).all(), (step, p, counts)
            assert bool(mask[:2].all())  # context rows untouched

    def test_use_gt_mask_iid_path_unchanged_by_exact_flag(self):
        """The default i.i.d. sampler ignores the new hparam entirely —
        same key, same mask as before the flag existed."""
        import jax
        import numpy as np

        hp = ModelHparams(context_frames=2, schedule_sampling="inverse_sigmoid")
        m1 = schedules.sample_use_gt_mask(jax.random.PRNGKey(7), jnp.asarray(3000), 8, 12, hp, True)
        p = float(schedules.ground_truth_prob(jnp.asarray(3000), hp))
        bern = jax.random.bernoulli(jax.random.PRNGKey(7), p, (11, 8))
        expect = np.array(bern, copy=True)
        expect[:2] = True
        assert (np.asarray(m1) == expect).all()


class TestDatasetHparams:
    def test_defaults_roundtrip(self):
        d = DatasetHparams()
        d2 = apply_overrides(d, d.to_dict())
        assert d == d2
