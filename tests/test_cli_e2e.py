"""End-to-end CLI tests: train a tiny model on the synthetic dataset, save
checkpoints + summaries, then evaluate and generate from the run directory
(the reference workflow: scripts/train.py -> evaluate.py -> plot_results.py,
exercised on SURVEY's config[0]-style CPU-runnable slice)."""

import glob
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

TINY = (
    "ngf=4,nef=8,nz=0,l1_weight=1.0,conv_rnn_norm=False,"
    "num_transformed_images=2,max_steps=3,batch_size=2"
)


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """Train 3 tiny steps on synthetic data; shared by downstream tests."""
    out = str(tmp_path_factory.mktemp("run"))
    import train as train_cli

    train_cli.main(
        [
            "--dataset", "synthetic",
            "--dataset_hparams", "sequence_length=4,context_frames=2",
            "--model", "savp",
            "--model_hparams", TINY,
            "--output_dir", out,
            "--save_freq", "3",
            "--progress_freq", "1",
            "--summary_freq", "0",
            "--eval_summary_freq", "0",
            "--image_summary_freq", "0",
            "--no_tensorboard",
        ]
    )
    return out


class TestTrainCLI:
    def test_outputs_exist(self, run_dir):
        assert os.path.exists(os.path.join(run_dir, "options.json"))
        assert os.path.exists(os.path.join(run_dir, "model_hparams.json"))
        assert os.path.exists(os.path.join(run_dir, "dataset_hparams.json"))
        with open(os.path.join(run_dir, "model_hparams.json")) as f:
            hp = json.load(f)
        assert hp["max_steps"] == 3
        ckpts = glob.glob(os.path.join(run_dir, "checkpoints", "*"))
        assert ckpts, "no checkpoints written"

    def test_resume(self, run_dir):
        import train as train_cli

        train_cli.main(
            [
                "--dataset", "synthetic",
                "--dataset_hparams", "sequence_length=4,context_frames=2",
                "--model", "savp",
                "--model_hparams", TINY.replace("max_steps=3", "max_steps=5"),
                "--output_dir", run_dir,
                "--resume",
                "--save_freq", "5",
                "--progress_freq", "0",
                "--summary_freq", "0",
                "--eval_summary_freq", "0",
                "--image_summary_freq", "0",
                "--no_tensorboard",
            ]
        )


class TestEvaluateCLI:
    def test_evaluate_writes_metrics_and_gallery(self, run_dir, tmp_path):
        import evaluate as eval_cli

        results = str(tmp_path / "results")
        eval_cli.main(
            [
                "--checkpoint", run_dir,
                "--results_dir", results,
                "--batch_size", "2",
                "--num_samples", "2",
                "--mode", "test",
            ]
        )
        base = os.path.join(results, "synthetic", "savp")
        psnr = np.loadtxt(os.path.join(base, "psnr.txt"))
        assert psnr.shape[0] == 2  # one row per example
        assert np.isfinite(psnr).all()
        assert os.path.exists(os.path.join(base, "index.html"))
        assert glob.glob(os.path.join(base, "images", "*.gif"))

    def test_plot_results(self, run_dir, tmp_path):
        import evaluate as eval_cli
        import plot_results as plot_cli

        results = str(tmp_path / "results")
        eval_cli.main(
            [
                "--checkpoint", run_dir,
                "--results_dir", results,
                "--batch_size", "2",
                "--num_samples", "2",
                "--only_metrics",
            ]
        )
        plot_cli.main([results])
        assert glob.glob(os.path.join(results, "plots", "*_psnr.png"))


class TestGenerateCLI:
    def test_generate_writes_gifs(self, run_dir, tmp_path):
        import generate as gen_cli

        results = str(tmp_path / "gen_results")
        gen_cli.main(
            [
                "--checkpoint", run_dir,
                "--results_dir", results,
                "--batch_size", "2",
                "--num_samples", "2",
            ]
        )
        out = os.path.join(results, "synthetic", "savp", "generated")
        assert glob.glob(os.path.join(out, "*.gif"))
