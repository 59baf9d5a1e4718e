#!/usr/bin/env python
"""Convert pretrained VGG16 weights into the .npz this framework loads.

The reference downloads TF-slim VGG checkpoints for its perceptual metric
(``vgg_network.py``); this environment has no network, so conversion from
a locally available source is the supported path. Sources:

- torchvision: ``--torch path/to/vgg16-*.pth`` (state_dict; features.* conv
  layers; kernels are OIHW and converted to HWIO here)
- keras H5: ``--keras path/to/vgg16_weights_tf_dim_ordering_tf_kernels_notop.h5``

Output: ``vgg16.npz`` with keys ``conv{block}_{idx}/kernel`` (HWIO) and
``conv{block}_{idx}/bias`` as consumed by ``models/vgg.py#load_params_npz``.
LPIPS linear weights can be added with ``--lpips path/to/lpips_vgg.pth``
(keys ``lin{i}/weight``).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# VGG16 conv layout: (block, n_convs)
_CFG = [(1, 2), (2, 2), (3, 3), (4, 3), (5, 3)]


def from_torchvision(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # torchvision features indices of conv layers in VGG16
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out = {}
    i = 0
    for block, n_convs in _CFG:
        for c in range(1, n_convs + 1):
            w = sd[f"features.{conv_idx[i]}.weight"].numpy()  # OIHW
            b = sd[f"features.{conv_idx[i]}.bias"].numpy()
            out[f"conv{block}_{c}/kernel"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
            out[f"conv{block}_{c}/bias"] = b
            i += 1
    return out


def from_keras(path: str) -> dict:
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        for block, n_convs in _CFG:
            for c in range(1, n_convs + 1):
                name = f"block{block}_conv{c}"
                grp = f[name][name] if name in f and name in f[name] else f[name]
                out[f"conv{block}_{c}/kernel"] = np.asarray(grp[f"{name}_W_1:0"] if f"{name}_W_1:0" in grp else grp["kernel:0"])
                out[f"conv{block}_{c}/bias"] = np.asarray(grp[f"{name}_b_1:0"] if f"{name}_b_1:0" in grp else grp["bias:0"])
    return out


def lpips_lins(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for i in range(5):
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if k in sd:
                out[f"lin{i}/weight"] = sd[k].numpy().reshape(-1)
                break
        else:
            raise KeyError(f"lin{i} weight not found in {path}")
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch", default="", help="torchvision vgg16 .pth state_dict")
    p.add_argument("--keras", default="", help="keras VGG16 notop .h5")
    p.add_argument("--lpips", default="", help="LPIPS (vgg variant) .pth for lin weights")
    p.add_argument("--out", default="vgg16.npz")
    args = p.parse_args()

    if args.torch:
        data = from_torchvision(args.torch)
    elif args.keras:
        data = from_keras(args.keras)
    else:
        p.error("one of --torch / --keras is required")
    np.savez(args.out, **data)
    print(f"wrote {args.out} ({len(data)} arrays)")

    if args.lpips:
        lp = lpips_lins(args.lpips)
        out2 = os.path.splitext(args.out)[0] + "_lpips.npz"
        np.savez(out2, **lp)
        print(f"wrote {out2} ({len(lp)} arrays)")

    # smoke: loadable by the metric
    from video_prediction_tpu.models.vgg import load_params_npz

    load_params_npz(args.out)
    print("verified: loads into models/vgg.py")


if __name__ == "__main__":
    main()
