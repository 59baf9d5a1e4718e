"""TPU-native stochastic video prediction framework.

A ground-up JAX/Flax/Pallas rebuild of the capability surface of
``alexlee-gk/video_prediction`` (SAVP, arXiv:1804.01523):

- ConvLSTM encoder-decoder generators with CDNA/DNA/SNA/flow transformation
  kernels, background compositing, and scheduled sampling
  (reference: ``video_prediction/models/savp_model.py``).
- Deterministic / VAE / GAN / VAE-GAN (SAVP) training objectives
  (reference: ``video_prediction/models/base_model.py``).
- TFRecord video datasets (BAIR push, KTH, ...) with a double-buffered
  host->device feed (reference: ``video_prediction/datasets/``).
- Per-frame PSNR/SSIM/VGG-cosine evaluation
  (reference: ``video_prediction/metrics.py``, ``scripts/evaluate.py``).

Design: pure-functional compute under ``jax.jit``; time iterated on-device
with ``lax.scan``; data parallelism via ``jax.sharding`` over a device mesh
(collectives compiled by XLA over ICI); hot ops as Pallas TPU kernels.
"""

import os as _os

# Persistent XLA compile cache for every entry point (CLIs, bench, tests):
# full-size SAVP compiles run minutes (remote TPU compile; 1-core host), and
# without this each `scripts/*.py` invocation pays it again. On this box
# ``sitecustomize`` imports jax at interpreter startup, so jax has already
# frozen its config from the environment before ANY user code runs — the
# env var alone is a silent no-op in-process (verified: config stays None)
# and ``jax.config.update`` is the only path that activates the cache. The
# env setdefault is still kept so spawned subprocesses inherit the setting.
_CACHE_DIR = _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)

import jax as _jax

if _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)

__version__ = "0.1.0"
