#!/usr/bin/env python
"""Generation (inference) throughput probe — the eval-side workload.

The reference's headline eval workflow is best-of-100 stochastic
sampling per test sequence (SURVEY §7 hard part #6); our evaluate.py
batches the samples dimension onto the device (`iter_sample_chunks`:
effective device batch = batch_size x samples_per_rollout). This probe
measures that rollout's sustained frames/s on the TPU across operating
points so the eval defaults are measured, not guessed.

No-grad rollouts have no remat/activation-memory wall, so the levers
differ from training: full unroll should fit at much larger effective
batches, and gate_dtype=bfloat16 is a pure win *for throughput* (numerics
note: evaluating an fp32-gate-trained checkpoint with bf16 gates is a
small numerics change — the training-side A/B showed eval PSNR/SSIM match
within noise, see ARCHITECTURE.md).

Honest clock (see bench.py docstring): ``jax.block_until_ready`` returns
at enqueue on this tunneled runtime. Rollouts here are accumulated into a
running device-side scalar and the timing fetches that VALUE, which
cannot materialize before every chained rollout has executed.

Examples:
    python scripts/bench_generate.py --batch 16 --samples 4
    python scripts/bench_generate.py --batch 64 --samples 16 --unroll 0 \
        --gate_dtype bfloat16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# allow `python scripts/<tool>.py` from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax


def probe(
    batch_size: int,
    samples_per_rollout: int,
    unroll: int,
    gate: str,
    gate_dtype: str,
    n_rollouts: int = 20,
    sequence_length: int = 12,
    context_frames: int = 2,
    size: int = 64,
    rounds: int = 2,
    extra_hparams: str = "",
) -> dict:
    """Sustained sec/rollout of the eval-path forward (train=False) at
    effective device batch = batch_size * samples_per_rollout — exactly
    what evaluate.py#iter_sample_chunks dispatches per chunk."""
    import jax.numpy as jnp

    from video_prediction_tpu.bench_common import savp_bench_hparams, synthetic_batch
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
        # the evaluate.py rollout, reduced to one scalar so chained calls
        # can be accumulated and synced with a single value fetch
        out = model.forward(params, batch, rng, jnp.zeros((), jnp.int32), train=False)
        return out["gen_images"].mean()

    # warmup + compile (value fetch = real sync, includes compile)
    t0 = time.perf_counter()
    acc = rollout_sum(params, batch, rng)
    float(acc)
    compile_s = time.perf_counter() - t0

    dt = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for i in range(n_rollouts):
            # acc depends on every rollout; the final value fetch cannot
            # materialize before all of them have executed
            acc = acc + rollout_sum(params, batch, jax.random.fold_in(rng, i))
        val = float(acc)
        dt = min(dt, time.perf_counter() - t0)
    # predicted frames per rollout: every sequence in the effective batch
    # predicts (T - context) frames
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


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batch", type=int, default=16, help="eval batch_size")
    p.add_argument(
        "--samples",
        type=int,
        default=8,
        help="samples_per_rollout (evaluate.py default 8); effective device "
        "batch is batch x samples",
    )
    p.add_argument("--unroll", type=int, default=0, help="scan_unroll (0 = full unroll)")
    p.add_argument("--gate", choices=("merged", "split"), default="split")
    p.add_argument("--gate_dtype", choices=("float32", "bfloat16"), default="bfloat16")
    p.add_argument("--rollouts", type=int, default=20, help="chained rollouts per round")
    p.add_argument("--sequence_length", type=int, default=12)
    p.add_argument("--context_frames", type=int, default=2)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--hparams", default="", help="extra k=v,... ModelHparams overrides")
    args = p.parse_args()

    from video_prediction_tpu.utils.watchdog import device_init_or_die

    device_init_or_die()
    r = probe(
        args.batch,
        args.samples,
        args.unroll,
        args.gate,
        args.gate_dtype,
        n_rollouts=args.rollouts,
        sequence_length=args.sequence_length,
        context_frames=args.context_frames,
        size=args.size,
        extra_hparams=args.hparams,
    )
    print(
        "RESULT batch={batch} samples={samples_per_rollout} eff={effective_batch} "
        "unroll={unroll} gate={gate} gate_dtype={gate_dtype} "
        "ms_per_rollout={ms_per_rollout:.1f} gen_frames_per_sec={gen_frames_per_sec:.0f} "
        "compile_s={compile_s:.0f}".format(**r),
        flush=True,
    )


if __name__ == "__main__":
    main()
