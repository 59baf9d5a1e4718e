#!/usr/bin/env python
"""Benchmark: SAVP training throughput on BAIR-shaped 64x64 video.

Measures sustained train frames/sec/chip for the flagship full SAVP model
(VAE + GAN, ConvLSTM/CDNA generator, video SN-discriminator) on synthetic
BAIR-shaped data (64x64x3, context 2 -> predict 10), the configuration
named by BASELINE.json's north star.

Prints ONE JSON line. Headline metric is batch 16 (apples-to-apples vs
the TF1 baseline estimate); the same line carries the batch-32/64 rows
(the efficient TPU operating points) and an MFU estimate from the
compiled step's XLA cost analysis.

TIMING METHODOLOGY (corrected in round 2 — r01's number was wrong):
``jax.block_until_ready`` does NOT synchronize with device execution on
this tunneled runtime — calibration: a chain of 8192^3 bf16 matmuls
"timed" at 19,000 TFLOPS with block-only sync on a 197-TFLOPS chip, i.e.
block returns at enqueue. Timing here therefore chains N train steps
(each step's TrainState feeds the next, so nothing can be skipped) and
fetches the final loss *value*, which cannot materialize before every
step has executed. Under this honest clock the same chip sustains ~146
TFLOPS on chained matmuls, so the harness is not the bottleneck.
BENCH_r01's 78,784 frames/s was the *enqueue* rate of the async pipe;
the sustained execution rate at batch 16 is ~365 frames/s/chip. The
previously documented "sticky ~441 ms/step slow mode" was this same
illusion: the async pipe absorbs the first ~20-40 steps, then
backpressure exposes the real execution rate.

Baseline: the reference (TF1 SAVP, alexlee-gk/video_prediction) publishes
no throughput numbers (BASELINE.md). We use an estimated 300 frames/sec
for the TF1 implementation on its 2018-era GPU (batch 16 x 10 predicted
frames at ~1.9 steps/sec, typical for this model class on a Titan Xp/
P100) as the denominator. vs_baseline = ours / 300.
"""

from __future__ import annotations

import json
import os
import sys

# keep fp32 params but bf16 conv/matmul compute via hparams below
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import numpy as np

REF_BASELINE_FRAMES_PER_SEC = 300.0  # estimated TF1 GPU baseline; see docstring

SEQ_LEN = 12
CONTEXT = 2
SIZE = 64
HEADLINE_BATCH = 16
BATCHES = (16, 32, 64)
# scan_unroll=0 fully unrolls the T-1 time loop: XLA fuses/pipelines across
# timesteps — measured 1.71x at batch 16 and 1.33x at batch 32 (honest
# clock). With fp32 gate math the fully-unrolled CSE'd graph OOMs HBM past
# ~batch 48 (measured 16.38G of 15.75G at 64 — the r3 "HTTP 500"
# re-diagnosis); bf16 gate math (below) halves the dominant gate-temp
# term and batch 64 fits fully unrolled (r4) — 96/128 still OOM
# (21.5G/22.4G), so 64 is the regime's boundary AND its best point.
UNROLL = {16: 0, 32: 0, 64: 0}
# ConvLSTM gate-conv layout per operating point (measured, see
# ARCHITECTURE.md): "merged" wins the unrolled 16/32 points (253 vs 256
# ms at batch 16), "split" edges it at the unrolled bf16-gate batch-64
# point (550 vs 556 ms).
GATE_CONV = {16: "merged", 32: "merged", 64: "split"}
# Per-row remat-CSE-barrier overrides; prevent_cse measured strictly
# slower everywhere it compiles (847/829 f/s at 64:0 fp32 vs 1164 CSE'd
# bf16), so no row sets it.
PREVENT_CSE: dict[int, bool] = {}
# bf16 ConvLSTM gate math (r4): +9% at batch 16, +15% at 32, +30% at 64
# (and unlocks full unroll there). Convergence A/B-verified on the full
# CLI path (600-step synthetic SAVP VAE-GAN, same seed: loss
# trajectories and eval PSNR/SSIM track fp32 — see ARCHITECTURE.md r4
# notes); the repo-wide DEFAULT stays fp32 (golden-pinned).
GATE_DTYPE = {16: "bfloat16", 32: "bfloat16", 64: "bfloat16"}

# peak dense bf16 FLOPS per chip by PJRT device_kind (public spec sheets);
# unknown kinds report mfu=None rather than a made-up number
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind
    # longest name first so "TPU v5 lite" matches its own entry, not "TPU v5"
    for name, peak in sorted(PEAK_BF16_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if kind.lower().startswith(name.lower()):
            return peak
    return None


def _forward_flops(model, ts, batch) -> float | None:
    """XLA cost-analysis flops of ONE forward pass (loss computation, no
    grad) on the fully-unrolled graph. Model train flops are conventionally
    3x this (1x forward + 2x backward) — independent of how much recompute
    the remat policy adds, so ``mfu_model`` measures useful work while
    ``mfu`` (executed flops) measures hardware occupancy (r2 VERDICT:
    executed-flops MFU alone flatters remat recompute)."""
    import jax.numpy as jnp

    def loss_only(params):
        total, _ = model.compute_losses(
            params, ts.model_state, batch, jax.random.PRNGKey(0),
            jnp.zeros((), jnp.int32), train=True,
        )
        return total

    try:
        cost = jax.jit(loss_only).lower(ts.params).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = cost.get("flops") if cost else None
        if f and np.isfinite(f) and f > 0:
            return float(f)
    except Exception:
        pass
    return None


def _bench_one(batch_size: int, n_steps: int = 30):
    """Sustained sec/step over ``n_steps`` chained steps, synced by
    fetching the final loss value (see module docstring — block_until_ready
    alone measures enqueue, not execution, on this runtime). Best of 2
    rounds guards against host-side noise. Hparams/batch/clock shared with
    scripts/bench_probe.py via bench_common (r3 ADVICE de-dup)."""
    from video_prediction_tpu.bench_common import (
        savp_bench_hparams,
        synthetic_batch,
        timed_chained_steps,
    )
    from video_prediction_tpu.models import get_model_class
    from video_prediction_tpu.train import create_train_state, make_train_step

    hp = savp_bench_hparams(
        batch_size,
        scan_unroll=UNROLL.get(batch_size, 1),
        lstm_gate_conv=GATE_CONV.get(batch_size, "merged"),
        prevent_cse=PREVENT_CSE.get(batch_size, False),
        gate_dtype=GATE_DTYPE.get(batch_size, "float32"),
    )
    model = get_model_class("savp")(hp)
    batch = synthetic_batch(batch_size)

    ts = create_train_state(model, jax.random.PRNGKey(0), batch)
    step_fn = make_train_step(model)

    # warmup + compile; value fetch = real sync
    ts, scalars = step_fn(ts, batch)
    float(scalars["g_loss"])

    # FLOPs/step from XLA's cost analysis — only meaningful on the fully
    # unrolled graph (a rolled lax.scan's cost analysis counts the loop
    # body ONCE, undercounting the step ~(T-1)x). Rows that keep the
    # rolled scan get flops scaled linearly in batch from an unrolled
    # row by the caller. Includes remat recompute (executed hardware
    # flops, not model flops).
    flops = None
    fwd_flops = None
    if hp.scan_unroll == 0:
        try:
            cost = step_fn.lower(ts, batch).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            f = cost.get("flops") if cost else None
            if f and np.isfinite(f) and f > 0:
                flops = float(f)
        except Exception:
            pass
        if batch_size == HEADLINE_BATCH:
            fwd_flops = _forward_flops(model, ts, batch)

    sec_per_step, ts, scalars = timed_chained_steps(step_fn, ts, batch, n_steps)
    return sec_per_step, flops, fwd_flops, float(scalars["g_loss"]), float(scalars["d_loss"])


def main():
    from video_prediction_tpu.utils.watchdog import device_init_or_die

    devices = device_init_or_die(
        json_stdout=True, metric="train_frames_per_sec_per_chip_bair64_savp"
    )
    n_chips = len(devices)
    peak = _peak_flops()
    device_kind = devices[0].device_kind

    rows = {}
    headline_fps = None
    headline_losses = None
    flops_per_example = None  # executed flops, from an unrolled row; linear in batch
    model_flops_per_example = None  # 3x forward flops (model flops, no recompute)
    results = []
    for bs in BATCHES:
        sec_per_step, flops, fwd_flops, g_loss, d_loss = _bench_one(
            bs, n_steps=30 if bs <= 32 else 20
        )
        results.append((bs, sec_per_step, flops))
        if flops and flops_per_example is None:
            flops_per_example = flops / bs
        if fwd_flops:
            model_flops_per_example = 3.0 * fwd_flops / bs
        if bs == HEADLINE_BATCH:
            headline_fps = bs * (SEQ_LEN - CONTEXT) / sec_per_step / n_chips
            headline_losses = (g_loss, d_loss)
    for bs, sec_per_step, flops in results:
        frames = bs * (SEQ_LEN - CONTEXT)
        fps_chip = frames / sec_per_step / n_chips
        est_flops = flops or (flops_per_example * bs if flops_per_example else None)
        mfu = (
            round(est_flops / sec_per_step / (peak * n_chips), 4)
            if (est_flops and peak)
            else None
        )
        model_flops = model_flops_per_example * bs if model_flops_per_example else None
        mfu_model = (
            round(model_flops / sec_per_step / (peak * n_chips), 4)
            if (model_flops and peak)
            else None
        )
        rows[f"batch{bs}"] = {
            "frames_per_sec_per_chip": round(fps_chip, 2),
            "ms_per_step": round(sec_per_step * 1e3, 3),
            "mfu": mfu,
            "mfu_model": mfu_model,
            "flops_per_step": est_flops,
            "model_flops_per_step": model_flops,
        }

    g_loss, d_loss = headline_losses
    if not (np.isfinite(g_loss) and np.isfinite(d_loss)):
        print(json.dumps({"error": f"non-finite losses g={g_loss} d={d_loss}"}), file=sys.stderr)
        sys.exit(1)

    # eval-side generation throughput at the measured sweet spot (effective
    # batch 256 = evaluate.py's batched best-of-N rollout; full sweep in
    # ARCHITECTURE.md's generation table). Secondary metric — a failure here
    # (e.g. a cold compile cache timing out) must not sink the train bench.
    generation = None
    try:
        from video_prediction_tpu.bench_common import generation_probe

        g = generation_probe(64, 4, n_rollouts=15)
        if np.isfinite(g["acc"]):
            generation = {
                "gen_frames_per_sec_per_chip": round(g["gen_frames_per_sec"] / n_chips, 2),
                "ms_per_rollout": round(g["ms_per_rollout"], 3),
                "effective_batch": g["effective_batch"],
            }
    except Exception as e:  # noqa: BLE001 — secondary metric, report and move on
        print(f"generation probe failed: {e!r}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "train_frames_per_sec_per_chip_bair64_savp",
                "value": round(headline_fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(headline_fps / REF_BASELINE_FRAMES_PER_SEC, 3),
                "device_kind": device_kind,
                "timing": "sustained, value-fetch synced (r01 measured async enqueue rate; see bench.py docstring)",
                "rows": rows,
                "generation": generation,
            }
        )
    )


if __name__ == "__main__":
    main()
