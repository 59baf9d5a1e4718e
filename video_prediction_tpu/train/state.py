"""Train state: params + two optimizers (G and D) + aux state + rng.

TPU-native counterpart of the reference's training variables
(``base_model.py``: two Adam train ops for generator and discriminator,
``global_step``, spectral-norm ``u`` vectors). Everything is one pytree so
orbax checkpoints capture the exact resumable state — the analog of
``tf.train.Saver`` snapshotting variables + optimizer slots (SURVEY §5).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from video_prediction_tpu.configs.hparams import ModelHparams
from video_prediction_tpu.train import schedules

GEN_KEYS = ("generator", "posterior", "prior")


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Dict[str, Any]
    model_state: Dict[str, Any]  # spectral-norm u vectors etc.
    opt_state_g: Any
    opt_state_d: Any
    rng: jax.Array


def split_params(params: Dict[str, Any]):
    """Partition the param tree into generator-side and discriminator-side."""
    g = {k: v for k, v in params.items() if k in GEN_KEYS}
    d = {k: v for k, v in params.items() if k == "discriminator"}
    return g, d


def make_optimizers(hp: ModelHparams):
    """Two Adam optimizers with the reference's LR schedule.

    The reference uses the same lr/betas for G and D
    (``base_model.py``: Adam(lr, beta1, beta2) for both train ops).
    """

    def lr_fn(count):
        return schedules.learning_rate(count, hp)

    tx_g = optax.adam(lr_fn, b1=hp.beta1, b2=hp.beta2)
    tx_d = optax.adam(lr_fn, b1=hp.beta1, b2=hp.beta2)
    return tx_g, tx_d


def create_train_state(
    model,
    rng: jax.Array,
    example_batch: Dict[str, Any],
) -> TrainState:
    rng_init, rng_run = jax.random.split(rng)
    params, model_state = model.init_variables(rng_init, example_batch)
    tx_g, tx_d = make_optimizers(model.hparams)
    params_g, params_d = split_params(params)
    opt_g = tx_g.init(params_g) if params_g else ()
    opt_d = tx_d.init(params_d) if params_d else ()
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_state_g=opt_g,
        opt_state_d=opt_d,
        rng=rng_run,
    )


def param_count(params) -> int:
    return sum(int(jnp.size(x)) for x in jax.tree_util.tree_leaves(params))
