#!/usr/bin/env python
"""Profile the jitted train step and print a per-op-type time table.

Captures a ``jax.profiler`` trace of N train steps on the current backend
and summarizes the device-op events (``utils/trace_summary.py``) — the
one-command answer to "where does the step time go". The reference has
no profiling tooling (SURVEY §5); TensorBoard can still open the raw
trace directory for the full timeline.

Example:
    python scripts/profile_step.py --model savp --batch_size 16 \
        --model_hparams "nz=8,kl_weight=0.01,video_sn_gan_weight=0.1,scan_unroll=0"
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

# allow `python scripts/<tool>.py` from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="savp")
    p.add_argument("--model_hparams", default="", help="k=v,... overrides")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--sequence_length", type=int, default=12)
    p.add_argument("--context_frames", type=int, default=2)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--steps", type=int, default=3, help="profiled steps after warmup")
    p.add_argument("--outdir", default="", help="trace dir (default: temp dir, kept)")
    p.add_argument("--top", type=int, default=25)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from video_prediction_tpu.configs.hparams import (
        ModelHparams,
        apply_overrides,
        parse_overrides,
    )
    from video_prediction_tpu.models import get_model_class
    from video_prediction_tpu.train import create_train_state, make_train_step
    from video_prediction_tpu.utils.trace_summary import find_trace_file, format_table, op_table

    hp = ModelHparams(
        context_frames=args.context_frames,
        sequence_length=args.sequence_length,
        batch_size=args.batch_size,
        l1_weight=100.0,
        compute_dtype="bfloat16",
    )
    if args.model_hparams:
        hp = apply_overrides(hp, parse_overrides(args.model_hparams))
    model = get_model_class(args.model)(hp)

    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(
            rng.rand(args.batch_size, hp.sequence_length, args.image_size, args.image_size, 3),
            jnp.float32,
        )
    }
    ts = create_train_state(model, jax.random.PRNGKey(0), batch)
    step = make_train_step(model)
    print("compiling + warmup ...", flush=True)
    ts, sc = step(ts, batch)
    print(f"warm g_loss={float(sc['g_loss']):.4f}", flush=True)

    outdir = args.outdir or tempfile.mkdtemp(prefix="profile_step_")
    jax.profiler.start_trace(outdir)
    for _ in range(args.steps):
        ts, sc = step(ts, batch)
    float(sc["g_loss"])  # value fetch = real sync (block_until_ready can lie)
    jax.profiler.stop_trace()

    trace = find_trace_file(outdir)
    if trace is None:
        raise SystemExit(f"no trace file found under {outdir}")
    total, steps, rows = op_table(trace)
    print(format_table(total, steps, rows, top=args.top))
    print(f"\nfull trace: {outdir} (open with TensorBoard's profile plugin)")


if __name__ == "__main__":
    main()
