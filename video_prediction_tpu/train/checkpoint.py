"""Orbax checkpointing of the full train state.

Counterpart of the reference's ``tf.train.Saver`` flow (``scripts/train.py``
``--save_freq``/``--resume``/``--checkpoint`` + ``utils/tf_utils.py#
get_checkpoint_restore_saver`` name remapping): saves the whole
``TrainState`` pytree (params, both optimizer states, spectral-norm ``u``
vectors, step, rng) and restores it for resume; ``restore_params_only``
covers the reference's warm-start-from-other-run path.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from video_prediction_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, save_interval_steps: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, ts: TrainState, force: bool = False) -> bool:
        step = int(jax.device_get(ts.step))
        if step in self._mgr.all_steps():
            return False  # already checkpointed (e.g. final save after a periodic one)
        saved = self._mgr.save(step, args=ocp.args.StandardSave(_to_saveable(ts)), force=force)
        return bool(saved)

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, ts_template: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore a full TrainState using ``ts_template`` for structure."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(_to_saveable(ts_template)))
        return _from_saveable(ts_template, restored)

    def restore_params(self, params_template: Any, step: Optional[int] = None) -> Any:
        """Warm-start: restore only the params subtree (reference
        ``--checkpoint`` flag semantics)."""
        ts = self.restore_dict(step)
        return _merge_matching(params_template, ts["params"])

    def restore_dict(self, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        # Template-less restore is deliberate here (eval/warm-start read the
        # raw tree and merge by path+shape); orbax warns loudly about the
        # missing target tree on every call — silence just that.
        import logging

        absl_logger = logging.getLogger("absl")
        prev = absl_logger.level
        absl_logger.setLevel(logging.ERROR)
        try:
            return self._mgr.restore(step)
        finally:
            absl_logger.setLevel(prev)

    def close(self):
        self._mgr.close()


def _to_saveable(ts: TrainState) -> dict:
    return {
        "step": ts.step,
        "params": ts.params,
        "model_state": ts.model_state,
        "opt_state_g": ts.opt_state_g,
        "opt_state_d": ts.opt_state_d,
        "rng": jax.random.key_data(ts.rng) if jax.dtypes.issubdtype(ts.rng.dtype, jax.dtypes.prng_key) else ts.rng,
    }


def _from_saveable(template: TrainState, d: dict) -> TrainState:
    rng = d["rng"]
    if jax.dtypes.issubdtype(template.rng.dtype, jax.dtypes.prng_key):
        rng = jax.random.wrap_key_data(np.asarray(rng))
    return TrainState(
        step=d["step"],
        params=d["params"],
        model_state=d["model_state"],
        opt_state_g=d["opt_state_g"],
        opt_state_d=d["opt_state_d"],
        rng=rng,
    )


def _merge_matching(template: Any, source: Any) -> Any:
    """Copy leaves from ``source`` into ``template`` where paths+shapes match
    (the analog of the reference's checkpoint variable-name remapping)."""
    if isinstance(template, dict) and isinstance(source, dict):
        out = {}
        for k, v in template.items():
            out[k] = _merge_matching(v, source[k]) if k in source else v
        return out
    t_leaf = np.asarray(jax.device_get(template))
    s_leaf = np.asarray(source)
    return s_leaf if t_leaf.shape == s_leaf.shape else template
