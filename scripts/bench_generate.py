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

# allow `python scripts/<tool>.py` from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")


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

    from video_prediction_tpu.bench_common import generation_probe
    from video_prediction_tpu.utils.watchdog import device_init_or_die

    device_init_or_die()
    r = generation_probe(
        args.batch,
        args.samples,
        unroll=args.unroll,
        gate=args.gate,
        gate_dtype=args.gate_dtype,
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
