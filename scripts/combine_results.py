#!/usr/bin/env python
"""Merge multiple evaluate.py result directories into one tree.

Counterpart of the reference's ``scripts/combine_results.py``: collects
``<dataset>/<method>/`` metric files from several results roots (e.g. runs
on different machines) into a single directory that ``plot_results.py``
can consume; on name collisions, later roots win unless ``--keep_first``.
"""

from __future__ import annotations

import argparse
import os
import sys

# allow `python scripts/<tool>.py` from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import shutil


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("inputs", nargs="+", help="results_dir roots to merge")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--keep_first", action="store_true")
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    for root in args.inputs:
        for dirpath, _, filenames in os.walk(root):
            rel = os.path.relpath(dirpath, root)
            dst_dir = os.path.join(args.output_dir, rel) if rel != "." else args.output_dir
            for fn in filenames:
                dst = os.path.join(dst_dir, fn)
                if args.keep_first and os.path.exists(dst):
                    continue
                os.makedirs(dst_dir, exist_ok=True)
                shutil.copy2(os.path.join(dirpath, fn), dst)
                print(f"{os.path.join(dirpath, fn)} -> {dst}")


if __name__ == "__main__":
    main()
