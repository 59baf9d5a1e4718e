"""Fixture tests for the VGG / LPIPS weight importers
(scripts/prepare_vgg_weights.py): synthetic torchvision state_dicts and
keras H5 files run through the converters, load via
models/vgg.py#load_params_npz, and drive the metric to assert tap shapes —
the only offline-testable piece of the VGG parity surface (r2 VERDICT
weak #5)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

# torchvision VGG16 "features" conv indices and their (out, in) channels
_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_CHANNELS = [
    (64, 3), (64, 64),
    (128, 64), (128, 128),
    (256, 128), (256, 256), (256, 256),
    (512, 256), (512, 512), (512, 512),
    (512, 512), (512, 512), (512, 512),
]
_CFG = [(1, 2), (2, 2), (3, 3), (4, 3), (5, 3)]
_TAP_CHANNELS = [64, 128, 256, 512, 512]


def _fake_torchvision_state_dict():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    sd = {}
    for idx, (o, i) in zip(_CONV_IDX, _CHANNELS):
        # small but non-constant values so the HWIO transpose is checkable
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            rng.randn(o, i, 3, 3).astype(np.float32) * 0.01
        )
        sd[f"features.{idx}.bias"] = torch.from_numpy(np.zeros(o, np.float32))
    return sd


class TestTorchvisionImporter:
    def test_convert_load_and_tap_shapes(self, tmp_path):
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp

        from prepare_vgg_weights import from_torchvision
        from video_prediction_tpu.models.vgg import VGG16Features, load_params_npz

        sd = _fake_torchvision_state_dict()
        pth = str(tmp_path / "vgg16_fake.pth")
        torch.save(sd, pth)

        data = from_torchvision(pth)
        # every conv{block}_{i} kernel+bias present, kernels HWIO
        i = 0
        for block, n_convs in _CFG:
            for c in range(1, n_convs + 1):
                o, in_ch = _CHANNELS[i]
                k = data[f"conv{block}_{c}/kernel"]
                assert k.shape == (3, 3, in_ch, o), (block, c, k.shape)
                # OIHW -> HWIO value-correct, not just shape-correct
                orig = sd[f"features.{_CONV_IDX[i]}.weight"].numpy()
                np.testing.assert_array_equal(k, np.transpose(orig, (2, 3, 1, 0)))
                assert data[f"conv{block}_{c}/bias"].shape == (o,)
                i += 1

        npz = str(tmp_path / "vgg16.npz")
        np.savez(npz, **data)
        variables = load_params_npz(npz)
        taps = VGG16Features().apply(variables, jnp.zeros((1, 32, 32, 3), jnp.float32))
        assert len(taps) == 5
        for tap, ch, scale in zip(taps, _TAP_CHANNELS, [1, 2, 4, 8, 16]):
            assert tap.shape == (1, 32 // scale, 32 // scale, ch)


class TestKerasImporter:
    def test_convert_and_load(self, tmp_path):
        h5py = pytest.importorskip("h5py")

        from prepare_vgg_weights import from_keras
        from video_prediction_tpu.models.vgg import load_params_npz

        rng = np.random.RandomState(0)
        path = str(tmp_path / "vgg16_notop.h5")
        i = 0
        with h5py.File(path, "w") as f:
            for block, n_convs in _CFG:
                for c in range(1, n_convs + 1):
                    o, in_ch = _CHANNELS[i]
                    name = f"block{block}_conv{c}"
                    grp = f.create_group(name).create_group(name)  # keras nests twice
                    grp.create_dataset(
                        "kernel:0", data=rng.randn(3, 3, in_ch, o).astype(np.float32)
                    )
                    grp.create_dataset("bias:0", data=np.zeros(o, np.float32))
                    i += 1
        data = from_keras(path)
        assert len(data) == 26  # 13 kernels + 13 biases
        assert data["conv3_2/kernel"].shape == (3, 3, 256, 256)
        npz = str(tmp_path / "vgg16.npz")
        np.savez(npz, **data)
        load_params_npz(npz)  # loads without KeyError


class TestLPIPSLinImporter:
    def test_lin_weights(self, tmp_path):
        torch = pytest.importorskip("torch")

        from prepare_vgg_weights import lpips_lins

        sd = {}
        for i, c in enumerate(_TAP_CHANNELS):
            # official LPIPS checkpoints store [1, C, 1, 1] 1x1-conv kernels
            sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
                np.abs(np.random.RandomState(i).randn(1, c, 1, 1)).astype(np.float32)
            )
        pth = str(tmp_path / "lpips_vgg.pth")
        torch.save(sd, pth)
        out = lpips_lins(pth)
        for i, c in enumerate(_TAP_CHANNELS):
            assert out[f"lin{i}/weight"].shape == (c,)
            np.testing.assert_array_equal(
                out[f"lin{i}/weight"], sd[f"lin{i}.model.1.weight"].numpy().reshape(-1)
            )
