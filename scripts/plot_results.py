#!/usr/bin/env python
"""Plot per-frame metric curves from evaluate.py outputs.

Counterpart of the reference's ``scripts/plot_results.py``: reads the
metric arrays (``<metric>[_max|_avg].txt``, one row per example) written by
``evaluate.py`` under ``results_dir/<dataset>/<method>/`` and renders
multi-method per-frame comparison curves (mean +/- stderr), one figure per
metric — the paper-figure workflow of SURVEY §5.
"""

from __future__ import annotations

import argparse
import os
import sys

# allow `python scripts/<tool>.py` from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("results_dir", help="results_dir/<dataset>/<method>/<metric>.txt trees")
    p.add_argument("--dataset", default="", help="restrict to one dataset subdir")
    p.add_argument("--metrics", nargs="*", default=["psnr", "ssim"])
    p.add_argument("--reduction", default="", help="'', 'max' or 'avg' file suffix")
    p.add_argument("--output_dir", default="", help="default: results_dir/plots")
    p.add_argument("--context_frames", type=int, default=2, help="x-axis offset for frame index")
    return p.parse_args(argv)


def load_metric(method_dir: str, metric: str, reduction: str):
    suffix = f"_{reduction}" if reduction else ""
    path = os.path.join(method_dir, f"{metric}{suffix}.txt")
    if not os.path.exists(path) and not reduction:
        # fall back to best-of-N files
        path = os.path.join(method_dir, f"{metric}_max.txt")
    if not os.path.exists(path):
        return None
    return np.loadtxt(path)


def main(argv=None):
    args = parse_args(argv)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    datasets = [args.dataset] if args.dataset else sorted(
        d for d in os.listdir(args.results_dir) if os.path.isdir(os.path.join(args.results_dir, d)) and d != "plots"
    )
    out_dir = args.output_dir or os.path.join(args.results_dir, "plots")
    os.makedirs(out_dir, exist_ok=True)

    for ds in datasets:
        ds_dir = os.path.join(args.results_dir, ds)
        methods = sorted(m for m in os.listdir(ds_dir) if os.path.isdir(os.path.join(ds_dir, m)))
        for metric in args.metrics:
            fig, ax = plt.subplots(figsize=(6, 4))
            plotted = False
            for method in methods:
                arr = load_metric(os.path.join(ds_dir, method), metric, args.reduction)
                if arr is None:
                    continue
                arr = np.atleast_2d(arr)
                mean = arr.mean(axis=0)
                stderr = arr.std(axis=0) / np.sqrt(arr.shape[0])
                x = np.arange(len(mean)) + args.context_frames + 1
                ax.plot(x, mean, marker="o", markersize=3, label=method)
                ax.fill_between(x, mean - stderr, mean + stderr, alpha=0.2)
                plotted = True
            if not plotted:
                plt.close(fig)
                continue
            ax.set_xlabel("frame")
            ax.set_ylabel(metric.upper())
            ax.set_title(f"{ds}: per-frame {metric.upper()}")
            ax.legend()
            ax.grid(alpha=0.3)
            out = os.path.join(out_dir, f"{ds}_{metric}.png")
            fig.savefig(out, dpi=150, bbox_inches="tight")
            plt.close(fig)
            print(f"wrote {out}")


if __name__ == "__main__":
    main()
