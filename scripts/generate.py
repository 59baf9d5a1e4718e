#!/usr/bin/env python
"""Generation CLI: dump predicted GIFs/PNGs without metrics.

Counterpart of the reference's ``scripts/generate.py`` (same flags minus
the metric outputs of evaluate.py).
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
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--dataset", default="")
    p.add_argument("--dataset_hparams", default="")
    p.add_argument("--model", default="")
    p.add_argument("--model_hparams", default="")
    p.add_argument("--mode", default="test")
    p.add_argument("--results_dir", default="results")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--num_stochastic_samples", type=int, default=1)
    p.add_argument(
        "--sequence_length",
        type=int,
        default=0,
        help="generate at this sequence length (0 -> trained length)",
    )
    p.add_argument(
        "--long",
        action="store_true",
        help="generate at the dataset's long_sequence_length",
    )
    p.add_argument("--gif_length", type=int, default=0)
    p.add_argument("--fps", type=int, default=4)
    p.add_argument("--save_png", action="store_true", help="also dump per-frame PNGs")
    p.add_argument("--seed", type=int, default=7)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

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

    run_dir = args.checkpoint
    with open(os.path.join(run_dir, "options.json")) as f:
        options = json.load(f)
    with open(os.path.join(run_dir, "model_hparams.json")) as f:
        hp = apply_overrides(ModelHparams(), json.load(f))
    with open(os.path.join(run_dir, "dataset_hparams.json")) as f:
        dhp = apply_overrides(DatasetHparams(), json.load(f))
    model_name = args.model or options["model"]
    dataset_name = args.dataset or options["dataset"]
    user_overrides = parse_overrides(args.model_hparams) if args.model_hparams else {}
    if user_overrides:
        hp = apply_overrides(hp, user_overrides)
    if args.dataset_hparams:
        dhp = apply_overrides(dhp, parse_overrides(args.dataset_hparams))
    # measured inference operating point (numerics-neutral; see helper docs)
    hp = adopt_inference_defaults(hp, user_overrides)

    # long-rollout generation (see evaluate.py: the scanned generator takes
    # its length from the input sequence)
    gen_len = args.sequence_length or (dhp.long_sequence_length if args.long else 0)
    if gen_len:
        hp = hp.replace(sequence_length=gen_len)
        dhp = dhp.replace(sequence_length=gen_len)

    dataset = get_dataset_class(dataset_name)(args.input_dir, mode=args.mode, hparams=dhp, seed=args.seed)
    model = get_model_class(model_name)(hp, mode=args.mode)

    rng = jax.random.PRNGKey(args.seed)
    it = dataset.make_iterator(args.batch_size)
    batch0 = next(it)
    params, _ = model.init_variables(rng, batch0)
    if model.generator is not None:
        ckpt = CheckpointManager(os.path.join(run_dir, "checkpoints"))
        params = ckpt.restore_params(params)

    @jax.jit
    def rollout(params, batch, rng):
        out = model.forward(params, batch, rng, jnp.zeros((), jnp.int32), train=False)
        return out["gen_images"]

    out_dir = os.path.join(args.results_dir, dataset_name, model_name, "generated")
    os.makedirs(out_dir, exist_ok=True)

    n_done = 0
    batch = batch0
    while n_done < args.num_samples:
        for s in range(args.num_stochastic_samples):
            gen = np.asarray(jax.device_get(rollout(params, batch, jax.random.fold_in(rng, n_done * 100 + s))))
            gif_len = args.gif_length or gen.shape[1]
            for b in range(gen.shape[0]):
                if n_done + b >= args.num_samples:
                    break
                stem = f"gen_{n_done + b:05d}_sample{s:02d}"
                save_gif(os.path.join(out_dir, stem + ".gif"), gen[b, :gif_len], args.fps)
                if args.save_png:
                    from PIL import Image

                    for t in range(min(gif_len, gen.shape[1])):
                        img = (np.clip(gen[b, t], 0, 1) * 255).astype(np.uint8)
                        Image.fromarray(img).save(os.path.join(out_dir, f"{stem}_t{t:03d}.png"))
        n_done += batch["images"].shape[0]
        batch = next(it)
    print(f"wrote generations to {out_dir}")


if __name__ == "__main__":
    main()
