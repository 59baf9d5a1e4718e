"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU with 8 virtual devices so the multi-device sharding
paths (data-parallel train step over a Mesh) are exercised without TPU
hardware, per SURVEY.md §4.

Platform forcing is belt-and-braces: this box's ``sitecustomize`` registers
the ``axon`` (tunneled TPU) PJRT plugin in every interpreter and overrides
``JAX_PLATFORMS`` from the environment, so the env var alone is NOT enough —
``jax.config.update('jax_platforms', 'cpu')`` after import is what actually
keeps tests off the TPU tunnel (which is ~10x slower per dispatch and must
stay free for benchmarks).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# This backend defaults matmuls/convs to bf16 even on CPU; tests need exact
# fp32 numerics. Production configs opt into bf16 via hparams.compute_dtype.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "float32")
# Persistent compilation cache: this box has 1 CPU core and XLA compiles
# dominate test wall-time; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
# sitecustomize imports jax at interpreter startup, so the env vars above
# never reach jax's config in this process — config.update is required
# (same trap as jax_platforms). Env setdefaults still cover subprocesses.
if jax.config.jax_compilation_cache_dir is None:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

assert jax.devices()[0].platform == "cpu", f"tests must run on CPU, got {jax.devices()}"
assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.device_count()}"
