#!/usr/bin/env python
"""Ad-hoc operating-point probe for the SAVP train step.

Times ONE (batch, scan_unroll, lstm_gate_conv) configuration of the
flagship full-SAVP train step (the same model/losses bench.py measures)
under the honest value-fetch clock, and prints one result line. Use it to
explore operating points bench.py's fixed rows don't cover — e.g. the
batch-48 rows, or an unroll retry after a toolchain change — without
editing bench.py.

Honest clock (see bench.py docstring): ``jax.block_until_ready`` returns
at enqueue on this tunneled runtime, so the probe chains ``--steps``
train steps (each TrainState feeds the next) and fetches the final loss
VALUE, which cannot materialize before every step has executed.

Examples:
    python scripts/bench_probe.py --batch 48 --unroll 6 --gate split
    python scripts/bench_probe.py --batch 16 --unroll 0 --gate merged --steps 30
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
    unroll: int,
    gate: str,
    n_steps: int = 20,
    sequence_length: int = 12,
    context_frames: int = 2,
    size: int = 64,
    rounds: int = 2,
    prevent_cse: bool = False,
    gate_dtype: str = "float32",
    extra_hparams: str = "",
) -> dict:
    """Measure sustained sec/step; returns a dict of the result row.

    Hparams/batch/clock shared with bench.py via bench_common (r3 ADVICE
    de-dup); the probe adds per-call compile timing on top."""
    from video_prediction_tpu.bench_common import (
        savp_bench_hparams,
        synthetic_batch,
        timed_chained_steps,
    )
    from video_prediction_tpu.models import get_model_class
    from video_prediction_tpu.train import create_train_state, make_train_step

    hp = savp_bench_hparams(
        batch_size,
        scan_unroll=unroll,
        lstm_gate_conv=gate,
        prevent_cse=prevent_cse,
        gate_dtype=gate_dtype,
        sequence_length=sequence_length,
        context_frames=context_frames,
        extra=extra_hparams,
    )
    model = get_model_class("savp")(hp)
    batch = synthetic_batch(batch_size, sequence_length, size)
    ts = create_train_state(model, jax.random.PRNGKey(0), batch)
    step_fn = make_train_step(model)

    t0 = time.perf_counter()
    ts, scalars = step_fn(ts, batch)
    g = float(scalars["g_loss"])  # value fetch = real sync (incl. compile)
    compile_s = time.perf_counter() - t0

    sec, ts, scalars = timed_chained_steps(step_fn, ts, batch, n_steps, rounds)
    return {
        "batch": batch_size,
        "unroll": unroll,
        "gate": gate,
        "gate_dtype": gate_dtype,
        "ms_per_step": sec * 1e3,
        "frames_per_sec": batch_size * (sequence_length - context_frames) / sec,
        "compile_s": compile_s,
        "g_loss": float(scalars["g_loss"]),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batch", type=int, required=True)
    p.add_argument("--unroll", type=int, default=1, help="scan_unroll (0 = full unroll)")
    p.add_argument("--gate", choices=("merged", "split"), default="split")
    p.add_argument("--steps", type=int, default=20, help="chained steps per timing round")
    p.add_argument("--sequence_length", type=int, default=12)
    p.add_argument("--context_frames", type=int, default=2)
    p.add_argument("--size", type=int, default=64)
    p.add_argument(
        "--prevent_cse",
        action="store_true",
        help="keep the remat CSE barrier at full unroll (memory-bounded, "
        "recompute returns; measured r4: lets batch 64 compile at "
        "scan_unroll=0 — 847 f/s split / 829 merged — but loses to the "
        "CSE'd bf16-gate regime, 1152 f/s)",
    )
    p.add_argument(
        "--hparams",
        default="",
        help="extra k=v,... ModelHparams overrides for ad-hoc levers "
        "(e.g. disc_conv3d_taps=True)",
    )
    p.add_argument(
        "--gate_dtype",
        choices=("float32", "bfloat16"),
        default="float32",
        help="ConvLSTM gate-math dtype (bfloat16 halves the dominant "
        "large-batch HBM term; fp32 is the golden-pinned default)",
    )
    args = p.parse_args()

    from video_prediction_tpu.utils.watchdog import device_init_or_die

    device_init_or_die()
    r = probe(
        args.batch,
        args.unroll,
        args.gate,
        n_steps=args.steps,
        sequence_length=args.sequence_length,
        context_frames=args.context_frames,
        size=args.size,
        prevent_cse=args.prevent_cse,
        gate_dtype=args.gate_dtype,
        extra_hparams=args.hparams,
    )
    r["prevent_cse"] = args.prevent_cse
    r["hparams"] = args.hparams
    print(
        "RESULT batch={batch} unroll={unroll} gate={gate} prevent_cse={prevent_cse} "
        "gate_dtype={gate_dtype} hparams={hparams!r} "
        "ms_per_step={ms_per_step:.1f} frames_per_sec={frames_per_sec:.1f} "
        "compile_s={compile_s:.0f} g_loss={g_loss:.4f}".format(**r),
        flush=True,
    )


if __name__ == "__main__":
    main()
