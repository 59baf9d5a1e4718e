"""Shared benchmark plumbing for bench.py and scripts/bench_probe.py.

Both tools time the SAME flagship configuration (full SAVP: VAE + GAN,
ConvLSTM/CDNA generator, image+video SN discriminators — the model named
by BASELINE.json's north star) under the SAME honest clock, so the
hparams block, the synthetic batch, and the chained-steps timing loop
live here once (r3 ADVICE: the two copies had already drifted on
n_steps defaults).

HONEST CLOCK (the r2 correction, see bench.py docstring for the full
story): ``jax.block_until_ready`` returns at *enqueue* on this tunneled
runtime, so timing chains ``n_steps`` train steps — each step's
TrainState feeds the next, so nothing can be elided — and fetches the
final loss VALUE, which cannot materialize before every chained step has
executed on the device.
"""

from __future__ import annotations

import time
from typing import Tuple

import numpy as np

SEQ_LEN = 12
CONTEXT = 2
SIZE = 64


def savp_bench_hparams(
    batch_size: int,
    *,
    scan_unroll: int,
    lstm_gate_conv: str,
    prevent_cse: bool = False,
    gate_dtype: str = "float32",
    sequence_length: int = SEQ_LEN,
    context_frames: int = CONTEXT,
    extra: str = "",
):
    """The canonical benchmark ModelHparams: full SAVP, bf16 compute.

    ``extra`` is a ``k=v,...`` override string for probing levers the
    named arguments don't cover (e.g. ``disc_conv3d_taps=True``)."""
    from video_prediction_tpu.configs.hparams import (
        ModelHparams,
        apply_overrides,
        parse_overrides,
    )

    hp = ModelHparams(
        context_frames=context_frames,
        sequence_length=sequence_length,
        batch_size=batch_size,
        l1_weight=100.0,
        kl_weight=0.01,
        nz=8,
        video_sn_gan_weight=0.1,
        video_sn_vae_gan_weight=0.1,
        gan_loss_type="LSGAN",
        beta1=0.5,
        transformation="cdna",
        num_transformed_images=4,
        schedule_sampling_k=900.0,
        compute_dtype="bfloat16",
        scan_unroll=scan_unroll,
        lstm_gate_conv=lstm_gate_conv,
        remat_prevent_cse=prevent_cse,
        gate_dtype=gate_dtype,
    )
    if extra:
        hp = apply_overrides(hp, parse_overrides(extra))
    return hp


def synthetic_batch(batch_size: int, sequence_length: int = SEQ_LEN, size: int = SIZE):
    """Deterministic synthetic BAIR-shaped image batch (fp32 [0,1))."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    return {
        "images": jnp.asarray(
            rng.rand(batch_size, sequence_length, size, size, 3), jnp.float32
        )
    }


def generation_probe(
    batch_size: int,
    samples_per_rollout: int,
    *,
    unroll: int = 0,
    gate: str = "split",
    gate_dtype: str = "bfloat16",
    n_rollouts: int = 20,
    sequence_length: int = SEQ_LEN,
    context_frames: int = CONTEXT,
    size: int = SIZE,
    rounds: int = 2,
    extra_hparams: str = "",
) -> dict:
    """Sustained sec/rollout of the eval-path forward (train=False) at
    effective device batch = batch_size * samples_per_rollout — exactly
    what evaluate.py#iter_sample_chunks dispatches per chunk (the
    reference's best-of-N stochastic-sampling workload, SURVEY §7 hard
    part #6). Same honest clock as training: rollouts accumulate into a
    device scalar and the timing fetches that VALUE. Shared by
    scripts/bench_generate.py and bench.py's ``generation`` row."""
    import jax
    import jax.numpy as jnp

    from video_prediction_tpu.models import get_model_class

    hp = savp_bench_hparams(
        batch_size,
        scan_unroll=unroll,
        lstm_gate_conv=gate,
        gate_dtype=gate_dtype,
        sequence_length=sequence_length,
        context_frames=context_frames,
        extra=extra_hparams,
    )
    model = get_model_class("savp")(hp, mode="test")
    eff = batch_size * samples_per_rollout
    batch = synthetic_batch(eff, sequence_length, size)

    rng = jax.random.PRNGKey(0)
    params, _ = model.init_variables(rng, batch)

    @jax.jit
    def rollout_sum(params, batch, rng):
        out = model.forward(params, batch, rng, jnp.zeros((), jnp.int32), train=False)
        return out["gen_images"].mean()

    t0 = time.perf_counter()
    acc = rollout_sum(params, batch, rng)
    float(acc)
    compile_s = time.perf_counter() - t0

    dt = float("inf")
    val = float("nan")
    for _ in range(rounds):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for i in range(n_rollouts):
            # acc depends on every rollout; the final value fetch cannot
            # materialize before all of them have executed
            acc = acc + rollout_sum(params, batch, jax.random.fold_in(rng, i))
        val = float(acc)
        dt = min(dt, time.perf_counter() - t0)
    frames = eff * (sequence_length - context_frames)
    return {
        "batch": batch_size,
        "samples_per_rollout": samples_per_rollout,
        "effective_batch": eff,
        "unroll": unroll,
        "gate": gate,
        "gate_dtype": gate_dtype,
        "ms_per_rollout": dt / n_rollouts * 1e3,
        "gen_frames_per_sec": frames / (dt / n_rollouts),
        "compile_s": compile_s,
        "acc": val,
    }


def timed_chained_steps(
    step_fn, ts, batch, n_steps: int, rounds: int = 2
) -> Tuple[float, object, dict]:
    """Best-of-``rounds`` sustained sec/step over ``n_steps`` chained steps,
    synced by fetching the final g_loss value. Returns
    (sec_per_step, final TrainState, final scalars)."""
    dt = float("inf")
    scalars = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            ts, scalars = step_fn(ts, batch)
        float(scalars["g_loss"])  # value fetch = the only real sync
        dt = min(dt, time.perf_counter() - t0)
    return dt / n_steps, ts, scalars
