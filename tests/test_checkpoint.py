"""Checkpoint save/restore round-trip tests (SURVEY §5 checkpoint/resume)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_prediction_tpu.configs.hparams import ModelHparams
from video_prediction_tpu.models import get_model_class
from video_prediction_tpu.train import create_train_state, make_train_step
from video_prediction_tpu.train.checkpoint import CheckpointManager


def _setup(tmp_path, **hp_kw):
    hp = ModelHparams(
        context_frames=2, sequence_length=4, ngf=4, nef=8, l1_weight=1.0,
        conv_rnn_norm=False, **hp_kw
    )
    model = get_model_class("savp")(hp)
    batch = {"images": jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 16, 16, 3))}
    ts = create_train_state(model, jax.random.PRNGKey(0), batch)
    return model, batch, ts, str(tmp_path / "ckpt")


class TestCheckpoint:
    def test_roundtrip_full_state(self, tmp_path):
        model, batch, ts, d = _setup(tmp_path)
        step = make_train_step(model, donate=False)
        ts, _ = step(ts, batch)
        ts, _ = step(ts, batch)

        mgr = CheckpointManager(d)
        assert mgr.save(ts, force=True)
        mgr.wait()
        assert mgr.latest_step() == 2

        ts0 = create_train_state(model, jax.random.PRNGKey(1), batch)
        restored = mgr.restore(ts0)
        assert int(restored.step) == 2
        for a, b in zip(jax.tree_util.tree_leaves(ts.params), jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # optimizer state restored too
        for a, b in zip(
            jax.tree_util.tree_leaves(ts.opt_state_g), jax.tree_util.tree_leaves(restored.opt_state_g)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_resume_continues_training(self, tmp_path):
        model, batch, ts, d = _setup(tmp_path)
        step = make_train_step(model, donate=False)
        ts, _ = step(ts, batch)
        mgr = CheckpointManager(d)
        mgr.save(ts, force=True)
        mgr.wait()
        restored = mgr.restore(create_train_state(model, jax.random.PRNGKey(2), batch))
        ts2, scalars = step(restored, batch)
        assert int(ts2.step) == 2
        assert np.isfinite(float(scalars["g_loss"]))

    def test_warm_start_params_only(self, tmp_path):
        model, batch, ts, d = _setup(tmp_path)
        mgr = CheckpointManager(d)
        mgr.save(ts, force=True)
        mgr.wait()
        template = jax.tree_util.tree_map(jnp.zeros_like, ts.params)
        params = mgr.restore_params(template)
        for a, b in zip(jax.tree_util.tree_leaves(ts.params), jax.tree_util.tree_leaves(params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
