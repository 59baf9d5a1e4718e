"""Golden regression tests (SURVEY §4 "Golden/parity"): fixed-seed loss
trajectories committed as expected values. Catches silent numeric drift
across refactors (e.g. a kernel reformulation changing math, precision
regressions, rng-threading changes). CPU fp32 only — conftest pins the
platform and matmul precision, so these are bit-stable across runs.

If a change legitimately alters numerics (new architecture, different op
order), regenerate with ``python tests/regen_golden.py`` (from the repo
root; prints fresh constants to paste in) and say so in the commit
message.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_prediction_tpu.configs.hparams import ModelHparams
from video_prediction_tpu.data.synthetic import SyntheticVideoDataset
from video_prediction_tpu.models import get_model_class
from video_prediction_tpu.train import create_train_state, make_train_step

# regenerated 2026-08-17 (round 3) after the ConvLSTM gate-conv merge:
# one conv over concat([x, h]) (reference BasicConv2DLSTMCell structure)
# replaced the split gates_x/gates_h pair, changing param init RNG paths
# (savp VAE, seed 42, synthetic seed 0, uint8 images + full-signal actions)
GOLDEN_LOSSES = [0.086703, 0.082483, 0.078181, 0.074547, 0.069578]

# same regeneration; full GAN path — video SN-disc + VAE-GAN pair +
# feature matching, LSGAN, joint two-optimizer update — so spectral-norm
# state and the G/D stop-gradient routing are drift-guarded like the VAE
# path (r2 VERDICT weak #7). Also reflects the round-3 feature-matching
# stop-grad fix (real features are a pure target now).
GOLDEN_GAN_G = [0.287486, 0.277969, 0.268314, 0.256942, 0.241903]
GOLDEN_GAN_D = [0.199894, 0.198031, 0.195912, 0.192767, 0.189023]

# generated 2026-08-18 (round 3): fixed-seed 5-step g_loss for the other
# trainable model families (dna = Finn-2016 relu-normalized per-pixel
# kernels + action/state conditioning; sna = first-image-background skip;
# sv2p = nz>0 where_add=middle KL-annealed) so the model_zoo realizations
# are drift-guarded like the savp paths. Full synthetic batch (images +
# actions + states), default split gate layout, seed 42 / data seed 0.
GOLDEN_ZOO = {
    "dna": [0.024232, 0.02293, 0.021497, 0.019935, 0.018271],
    "sna": [0.009134, 0.008537, 0.007921, 0.007289, 0.006651],
    # sv2p regenerated 2026-08-19 (round 4): latent_time_invariant=True
    # became the sv2p default (one z per sequence — the defining SV2P
    # stochastic structure), changing the posterior output/KL numerics
    "sv2p": [0.015384564, 0.015828051, 0.015263218, 0.012817921, 0.011558477],
}
_ZOO_EXTRA = {
    "dna": {},
    "sna": dict(num_transformed_images=2),
    "sv2p": dict(nz=4, kl_anneal_steps=(2, 4), num_transformed_images=2),
}

# generated 2026-08-18 (round 3): savp with learn_prior=True — the in-cell
# LearnedPrior net (reworked this round for the eval-leak fix) gets its own
# drift guard; the KL here is posterior-vs-learned-prior, a different code
# path from the unit-Gaussian flagship above.
GOLDEN_LEARNED_PRIOR = [0.113101818, 0.105427936, 0.098267116, 0.092706695, 0.085583836]

# generated 2026-08-18 (round 3): savp with conv_rnn="gru" — the ConvGRU
# cell path (reference rnn_ops.py#Conv2DGRUCell) pinned like the LSTM one.
GOLDEN_GRU = [0.086281881, 0.078800932, 0.075991817, 0.071156323, 0.063425764]


def _setup():
    ds = SyntheticVideoDataset(mode="train", seed=0, image_size=16)
    batch = {"images": jnp.asarray(next(ds.make_iterator(2))["images"][:, :6])}
    hp = ModelHparams(
        context_frames=2,
        sequence_length=6,
        ngf=4,
        nef=8,
        nz=4,
        kl_weight=0.1,
        l1_weight=1.0,
        num_transformed_images=2,
        conv_rnn_norm=False,
        schedule_sampling="always",
        # pinned: the committed constants were generated with the merged
        # gate layout; the hparam DEFAULT is "split" (pre-existing
        # checkpoint compatibility), so keep this explicit
        lstm_gate_conv="merged",
    )
    model = get_model_class("savp")(hp)
    return model, batch


def _trajectory(model, batch, n=5):
    """n-step (g_loss, d_loss) lists from a fresh seed-42 TrainState."""
    ts = create_train_state(model, jax.random.PRNGKey(42), batch)
    step = make_train_step(model, donate=False)
    g, d = [], []
    for _ in range(n):
        ts, sc = step(ts, batch)
        g.append(float(sc["g_loss"]))
        d.append(float(sc["d_loss"]))
    return g, d


def _gan_setup():
    ds = SyntheticVideoDataset(mode="train", seed=0, image_size=16)
    batch = {"images": jnp.asarray(next(ds.make_iterator(2))["images"][:, :6])}
    hp = ModelHparams(
        context_frames=2, sequence_length=6, ngf=4, nef=8, ndf=4, nz=4,
        kl_weight=0.1, l1_weight=1.0, num_transformed_images=2,
        conv_rnn_norm=False, schedule_sampling="always",
        video_sn_gan_weight=0.1, video_sn_vae_gan_weight=0.1,
        vae_gan_feature_l2_weight=1.0, gan_loss_type="LSGAN", clip_length=4,
        lstm_gate_conv="merged",  # see _setup: constants pin this layout
    )
    return get_model_class("savp")(hp), batch


def _gru_setup():
    model, batch = _setup()
    return type(model)(model.hparams.replace(conv_rnn="gru")), batch


def _prior_setup():
    model, batch = _setup()
    # kl_anneal="none": the default linear anneal is exactly 0 below step
    # 50k, which would make this golden vacuous (identical to the VAE one —
    # verified); with it off the KL(q || learned p) term is live from step 1
    hp = model.hparams.replace(learn_prior=True, kl_weight=0.1, kl_anneal="none")
    return type(model)(hp), batch


def _zoo_setup(name):
    ds = SyntheticVideoDataset(mode="train", seed=0, image_size=16)
    raw = next(ds.make_iterator(2))
    batch = {k: jnp.asarray(v[:, :6]) for k, v in raw.items()}
    cls = get_model_class(name)
    hp = cls.default_hparams().replace(
        ngf=4, nef=8, conv_rnn_norm=False, schedule_sampling="always",
        context_frames=2, sequence_length=6, **_ZOO_EXTRA[name],
    )
    return cls(hp), batch


class TestGolden:
    def test_loss_trajectory_matches_committed_values(self):
        model, batch = _setup()
        losses, _ = _trajectory(model, batch, n=len(GOLDEN_LOSSES))
        np.testing.assert_allclose(losses, GOLDEN_LOSSES, rtol=1e-4)

    def test_gan_loss_trajectory_matches_committed_values(self):
        """Fixed-seed 5-step g/d losses for a tiny full-GAN config (video
        SN-disc + VAE-GAN + feature matching): pins spectral-norm power
        iteration and the joint G+D update against numeric drift."""
        g, d = _trajectory(*_gan_setup(), n=len(GOLDEN_GAN_G))
        np.testing.assert_allclose(g, GOLDEN_GAN_G, rtol=1e-4)
        np.testing.assert_allclose(d, GOLDEN_GAN_D, rtol=1e-4)

    @pytest.mark.parametrize("name", sorted(GOLDEN_ZOO))
    def test_zoo_model_loss_trajectories(self, name):
        losses, _ = _trajectory(*_zoo_setup(name))
        np.testing.assert_allclose(losses, GOLDEN_ZOO[name], rtol=1e-4)

    def test_learned_prior_loss_trajectory(self):
        losses, _ = _trajectory(*_prior_setup())
        np.testing.assert_allclose(losses, GOLDEN_LEARNED_PRIOR, rtol=1e-4)

    def test_gru_loss_trajectory(self):
        losses, _ = _trajectory(*_gru_setup())
        np.testing.assert_allclose(losses, GOLDEN_GRU, rtol=1e-4)

    def test_init_is_deterministic(self):
        model, batch = _setup()
        p1, _ = model.init_variables(jax.random.PRNGKey(7), batch)
        p2, _ = model.init_variables(jax.random.PRNGKey(7), batch)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


