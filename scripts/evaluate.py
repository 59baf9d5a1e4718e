#!/usr/bin/env python
"""Evaluation CLI.

Counterpart of the reference's ``scripts/evaluate.py``: restores a trained
run, rolls out predictions on the test set, computes per-frame
PSNR/SSIM (and VGG cosine similarity when VGG weights are provided),
supports best-of-N stochastic sampling (``--num_stochastic_samples``,
reduced by max and mean per metric), and writes metric arrays (.txt),
prediction GIFs, and an HTML gallery under
``results_dir/<dataset>/<model>/`` — the same output contract the
reference's ``plot_results.py`` consumes.

TPU-first: each stochastic sample is a fresh jitted rollout with a new rng
fold; samples never leave the device until the final metric reduction.
"""

from __future__ import annotations

import argparse
import os
import sys

# allow `python scripts/<tool>.py` from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--input_dir", default="")
    p.add_argument(
        "--checkpoint",
        default="",
        help="training output_dir to restore; may be omitted for the "
        "non-trainable baselines (--model ground_truth|repeat)",
    )
    p.add_argument("--dataset", default="")
    p.add_argument("--dataset_hparams", default="")
    p.add_argument("--model", default="")
    p.add_argument("--model_hparams", default="")
    p.add_argument("--mode", default="test")
    p.add_argument("--results_dir", default="results")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument(
        "--num_samples",
        type=int,
        default=32,
        help="test examples to evaluate; 0 -> the WHOLE test set "
        "(dataset.num_examples_per_epoch(), reference evaluate.py behavior)",
    )
    p.add_argument("--num_stochastic_samples", type=int, default=1)
    p.add_argument(
        "--samples_per_rollout",
        type=int,
        default=8,
        help="stochastic samples batched into one device rollout (the sample "
        "dim rides the batch dim on the TPU instead of a host loop)",
    )
    p.add_argument(
        "--sequence_length",
        type=int,
        default=0,
        help="evaluate at this sequence length (0 -> trained length); the "
        "scanned generator is length-agnostic so rollouts longer than the "
        "trained length just keep predicting",
    )
    p.add_argument(
        "--long",
        action="store_true",
        help="evaluate at the dataset's long_sequence_length (reference "
        "base_dataset.py long-rollout workflow, e.g. KTH ctx 10 -> predict 30)",
    )
    p.add_argument("--gif_length", type=int, default=0, help="0 -> full sequence")
    p.add_argument("--fps", type=int, default=4)
    p.add_argument("--only_metrics", action="store_true")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument(
        "--vgg_weights_path",
        default="",
        help="VGG16 .npz (see models/vgg.py); enables the per-frame VGG "
        "cosine-similarity metric (reference metrics.py vgg_csim)",
    )
    p.add_argument(
        "--lpips_weights_path",
        default="",
        help="LPIPS linear weights .npz (lin{0..4}/weight; see models/lpips.py); "
        "with --vgg_weights_path, enables the per-frame LPIPS metric "
        "(reference lpips-tensorflow submodule)",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import numpy as np

    from video_prediction_tpu import metrics as M
    from video_prediction_tpu.configs.hparams import (
        DatasetHparams,
        ModelHparams,
        adopt_inference_defaults,
        apply_overrides,
        parse_overrides,
    )
    from video_prediction_tpu.data import get_dataset_class
    from video_prediction_tpu.models import get_model_class
    from video_prediction_tpu.train.checkpoint import CheckpointManager
    from video_prediction_tpu.utils.gif import save_gif
    from video_prediction_tpu.utils.html import HTML

    # ---- rebuild exactly what was trained (reference reads saved options) ----
    run_dir = args.checkpoint
    if run_dir:
        with open(os.path.join(run_dir, "options.json")) as f:
            options = json.load(f)
        with open(os.path.join(run_dir, "model_hparams.json")) as f:
            hp = apply_overrides(ModelHparams(), json.load(f))
        with open(os.path.join(run_dir, "dataset_hparams.json")) as f:
            dhp = apply_overrides(DatasetHparams(), json.load(f))
    else:
        # checkpoint-free path: the non-trainable baselines (ground_truth,
        # repeat) evaluate straight from flags, like the reference
        if not (args.model and args.dataset):
            raise SystemExit("--checkpoint omitted: both --model and --dataset are required")
        options = {"model": args.model, "dataset": args.dataset}
        hp = get_model_class(args.model).default_hparams()
        dhp = get_dataset_class(args.dataset).default_hparams
        hp = hp.replace(context_frames=dhp.context_frames, sequence_length=dhp.sequence_length)
    model_name = args.model or options["model"]
    dataset_name = args.dataset or options["dataset"]
    user_overrides = parse_overrides(args.model_hparams) if args.model_hparams else {}
    if user_overrides:
        hp = apply_overrides(hp, user_overrides)
    if args.dataset_hparams:
        dhp = apply_overrides(dhp, parse_overrides(args.dataset_hparams))
    # measured inference operating point (numerics-neutral; see helper docs)
    hp = adopt_inference_defaults(hp, user_overrides)

    # long-rollout evaluation: rebuild both hparams at the longer T (the
    # scanned generator takes its length from the input sequence)
    eval_len = args.sequence_length or (dhp.long_sequence_length if args.long else 0)
    if eval_len:
        if eval_len > dhp.sequence_length:
            print(f"long rollout: sequence_length {dhp.sequence_length} -> {eval_len}")
        hp = hp.replace(sequence_length=eval_len)
        dhp = dhp.replace(sequence_length=eval_len)

    dataset = get_dataset_class(dataset_name)(args.input_dir, mode=args.mode, hparams=dhp, seed=args.seed)
    model = get_model_class(model_name)(hp, mode=args.mode)

    # ---- restore ----
    rng = jax.random.PRNGKey(args.seed)
    batch0 = next(dataset.make_iterator(args.batch_size))
    params, _ = model.init_variables(rng, batch0)
    if model.generator is not None:
        if not run_dir:
            raise SystemExit(f"model {model_name!r} is trainable; --checkpoint is required")
        ckpt = CheckpointManager(os.path.join(run_dir, "checkpoints"))
        params = ckpt.restore_params(params)
        print(f"restored step {ckpt.latest_step()} from {run_dir}")

    import jax.numpy as jnp

    @jax.jit
    def rollout(params, batch, rng):
        out = model.forward(params, batch, rng, jnp.zeros((), jnp.int32), train=False)
        return out["gen_images"]

    def iter_sample_chunks(params, batch, rng, n_samples):
        """Yield stochastic rollouts in chunks of ``samples_per_rollout``,
        batched on-device: the sample dim rides the batch dim (SURVEY §7
        hard part #6 — no per-sample host loop). Chunked so host RAM holds
        O(k) samples, not all N (streaming max/mean reduction downstream)."""
        k = max(1, min(args.samples_per_rollout, n_samples))
        b = batch["images"].shape[0]
        tiled = {kk: np.repeat(v, k, axis=0) for kk, v in batch.items()}
        done = 0
        while done < n_samples:
            gen = rollout(params, tiled, jax.random.fold_in(rng, done))
            gen = np.asarray(jax.device_get(gen)).reshape(b, k, *gen.shape[1:])
            take = min(k, n_samples - done)
            yield gen[:, :take]  # [B, take, T-1, H, W, C]
            done += k

    results_dir = os.path.join(args.results_dir, dataset_name, model_name)
    os.makedirs(results_dir, exist_ok=True)
    html = None if args.only_metrics else HTML(results_dir, title=f"{dataset_name}/{model_name}")

    vgg = None
    if args.vgg_weights_path:
        from video_prediction_tpu.models.vgg import VGGMetric

        vgg = VGGMetric(weights_path=args.vgg_weights_path)
    lpips = None
    if args.lpips_weights_path:
        from video_prediction_tpu.models.lpips import LPIPSMetric

        lpips = LPIPSMetric(
            vgg_weights_path=args.vgg_weights_path, lin_weights_path=args.lpips_weights_path
        )

    ctx = hp.context_frames
    metric_names = (
        ["psnr", "ssim"]
        + (["vgg_csim"] if vgg is not None else [])
        + (["lpips"] if lpips is not None else [])
    )
    all_metrics = {m: [] for m in metric_names}  # best-of-N, per example per frame
    all_metrics_avg = {m: [] for m in metric_names}
    num_samples = args.num_samples
    if num_samples == 0:
        # whole test set (reference evaluate.py walks num_examples_per_epoch)
        num_samples = dataset.num_examples_per_epoch()
        print(f"evaluating the whole test set: {num_samples} examples")
    it = dataset.make_iterator(args.batch_size)
    n_done = 0
    sample_idx = 0
    while n_done < num_samples:
        batch = next(it)
        images = batch["images"]
        if images.dtype == np.uint8:  # datasets ship uint8; metrics want [0,1]
            images = images.astype(np.float32) / 255.0
        target = images[:, ctx:]
        # streaming max/sum reduction over stochastic samples — host RAM
        # holds one chunk of rollouts at a time, never all N
        metric_best = {m: None for m in metric_names}  # [B, Tp] running max
        metric_sum = {m: None for m in metric_names}  # [B, Tp] running sum
        best_gen = None  # [B, T-1, ...] best-psnr rollout (for the gallery)
        best_score = None  # [B]
        n_stoch = 0
        for chunk in iter_sample_chunks(
            params, batch, jax.random.fold_in(rng, sample_idx), args.num_stochastic_samples
        ):
            for s in range(chunk.shape[1]):
                gen = chunk[:, s]
                pred = gen[:, ctx - 1 :]
                vals = {
                    "psnr": np.asarray(M.peak_signal_to_noise_ratio(target, pred)),
                    "ssim": np.asarray(M.structural_similarity(target, pred)),
                }
                if vgg is not None:
                    vals["vgg_csim"] = np.asarray(vgg(target, pred))
                if lpips is not None:
                    # lower is better: negate so the best-of-N max reduction
                    # picks the closest sample (sign restored on write-out)
                    vals["lpips"] = -np.asarray(lpips(target, pred))
                for m in metric_names:
                    metric_best[m] = (
                        vals[m] if metric_best[m] is None else np.maximum(metric_best[m], vals[m])
                    )
                    metric_sum[m] = vals[m] if metric_sum[m] is None else metric_sum[m] + vals[m]
                n_stoch += 1
                if html is not None:
                    score = vals["psnr"].mean(axis=-1)  # [B]
                    if best_gen is None:
                        best_gen, best_score = gen.copy(), score
                    else:
                        better = score > best_score
                        best_gen[better] = gen[better]
                        best_score = np.maximum(best_score, score)
        # reductions over samples (reference: "max" best-of-N and mean)
        for m in metric_names:
            all_metrics[m].append(metric_best[m])
            all_metrics_avg[m].append(metric_sum[m] / n_stoch)

        if html is not None:
            gif_len = args.gif_length or images.shape[1]
            for b in range(images.shape[0]):
                if n_done + b >= num_samples:
                    break
                gt_name = f"gt_{n_done + b:05d}.gif"
                gen_name = f"gen_{n_done + b:05d}.gif"
                save_gif(os.path.join(html.get_image_dir(), gt_name), images[b, :gif_len], args.fps)
                gen_full = np.concatenate([images[b, :1], best_gen[b]], axis=0)
                save_gif(os.path.join(html.get_image_dir(), gen_name), gen_full[:gif_len], args.fps)
                html.add_header(f"example {n_done + b}")
                html.add_images(
                    [f"images/{gt_name}", f"images/{gen_name}"],
                    ["ground truth", model_name],
                    height=128,
                )
        n_done += images.shape[0]
        sample_idx += 1

    # ---- write metric arrays (reference format: one row per example) ----
    # with a single stochastic sample the max/avg reductions coincide: write
    # every metric once as <name>.txt; with N>1 write <name>_{max,avg}.txt
    if args.num_stochastic_samples == 1:
        reductions = [("max", all_metrics)]
    else:
        reductions = [("max", all_metrics), ("avg", all_metrics_avg)]
    for red, metr in reductions:
        for name, chunks in metr.items():
            arr = np.concatenate(chunks, axis=0)[:num_samples]  # [N, Tp]
            if name == "lpips":
                arr = -arr  # stored negated for the best-of-N reduction
            suffix = f"_{red}" if args.num_stochastic_samples > 1 else ""
            path = os.path.join(results_dir, f"{name}{suffix}.txt")
            np.savetxt(path, arr)
            print(f"{name} ({red}): mean={arr.mean():.4f}  per-frame={np.array2string(arr.mean(axis=0), precision=3)}")

    if html is not None:
        print(f"gallery: {html.save()}")


if __name__ == "__main__":
    main()
