"""Training schedules: LR decay, KL annealing, scheduled sampling.

TPU-native counterpart of the schedule logic in the reference's
``models/base_model.py`` (learning-rate decay + ``kl_anneal``/``kl_anneal_k``
KL weight) and ``savp_model.py`` (inverse-sigmoid scheduled sampling,
``schedule_sampling_k``). All are pure functions of a traced ``step`` so
they live inside the jitted train step without retracing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from video_prediction_tpu.configs.hparams import ModelHparams


def learning_rate(step: jax.Array, hp: ModelHparams) -> jax.Array:
    """Piecewise-linear decay from ``lr`` to ``end_lr`` over
    ``decay_steps = (start, end)`` (reference base_model LR schedule)."""
    step = step.astype(jnp.float32)
    s0, s1 = hp.decay_steps
    if s1 <= s0:
        return jnp.float32(hp.lr)
    frac = jnp.clip((step - s0) / (s1 - s0), 0.0, 1.0)
    return hp.lr + (hp.end_lr - hp.lr) * frac


def kl_weight(step: jax.Array, hp: ModelHparams) -> jax.Array:
    """Annealed KL coefficient (multiplies ``hp.kl_weight``).

    ``none``: constant 1. ``linear``: 0 -> 1 over ``kl_anneal_steps``.
    ``sigmoid``: logistic ramp with rate ``kl_anneal_k`` centered midway.
    Reference: ``base_model.py`` ``kl_anneal*`` hparams.
    """
    step = step.astype(jnp.float32)
    if hp.kl_anneal == "none":
        return jnp.float32(1.0)
    s0, s1 = hp.kl_anneal_steps
    if hp.kl_anneal == "linear":
        return jnp.clip((step - s0) / max(s1 - s0, 1), 0.0, 1.0)
    if hp.kl_anneal == "sigmoid":
        k = hp.kl_anneal_k
        if k <= 0:
            k = (s1 - s0) / 10.0 or 1.0
        mid = 0.5 * (s0 + s1)
        return jax.nn.sigmoid((step - mid) / k)
    raise ValueError(f"unknown kl_anneal {hp.kl_anneal!r}")


def ground_truth_prob(step: jax.Array, hp: ModelHparams) -> jax.Array:
    """Probability of feeding the ground-truth frame (vs the model's own
    prediction) after the context frames, as a function of the global step.

    ``inverse_sigmoid``: k/(k + exp(step/k)) (Bengio et al. 2015; reference
    ``schedule_sampling_k``). ``linear``: 1 -> 0 over
    ``schedule_sampling_steps``. ``none``: always autoregressive (0).
    ``always``: always teacher-forced (1).
    """
    step = step.astype(jnp.float32)
    if hp.schedule_sampling == "none":
        return jnp.float32(0.0)
    if hp.schedule_sampling == "always":
        return jnp.float32(1.0)
    s0, s1 = hp.schedule_sampling_steps
    step_rel = jnp.maximum(step - s0, 0.0)
    if hp.schedule_sampling == "inverse_sigmoid":
        k = jnp.float32(hp.schedule_sampling_k)
        # clip the exponent for numerical safety at large steps
        return k / (k + jnp.exp(jnp.minimum(step_rel / k, 30.0)))
    if hp.schedule_sampling == "linear":
        return jnp.clip(1.0 - step_rel / max(s1 - s0, 1), 0.0, 1.0)
    raise ValueError(f"unknown schedule_sampling {hp.schedule_sampling!r}")


def sample_use_gt_mask(
    rng: jax.Array,
    step: jax.Array,
    batch: int,
    seq_len: int,
    hp: ModelHparams,
    train: bool,
) -> jax.Array:
    """Per-(timestep, sample) teacher-forcing mask ``[T-1, B]`` (bool).

    Context-frame inputs (t < context_frames) are always ground truth.
    Two samplers, selected by ``hp.schedule_sampling_exact``:
    i.i.d. bernoulli(p) per (t, b) — the default — or the reference
    ``scheduled_sample``'s exact-count semantics: exactly round(p*B)
    ground-truth samples per timestep, chosen by a per-timestep random
    rank cut (jit-friendly equivalent of shuffle-and-take-first-k).
    Identical in expectation; exact removes the per-step count variance.
    """
    tm1 = seq_len - 1
    t_idx = jnp.arange(tm1)[:, None]  # [T-1, 1]
    in_context = t_idx < hp.context_frames
    if not train or hp.schedule_sampling == "none":
        return jnp.broadcast_to(in_context, (tm1, batch))
    p = ground_truth_prob(step, hp)
    if hp.schedule_sampling_exact:
        # rank cut: mark the k = round(p*B) lowest of B uniforms per row.
        # k is traced (depends on step) so the comparison, not the shape,
        # carries the data dependence — static shapes under jit.
        u = jax.random.uniform(rng, (tm1, batch))
        k = jnp.round(p * batch).astype(jnp.int32)
        ranks = jnp.argsort(jnp.argsort(u, axis=1), axis=1)
        return jnp.logical_or(in_context, ranks < k)
    bern = jax.random.bernoulli(rng, p, (tm1, batch))
    return jnp.logical_or(in_context, bern)
