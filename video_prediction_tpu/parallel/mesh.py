"""Device mesh + sharding helpers: the data-parallel + spatial layer.

This module *replaces* the reference's entire multi-GPU tower subsystem
(``base_model.py`` tower split + ``utils/tf_utils.py#
compute_averaged_gradients`` + ``local_device_setter``): we shard the batch
over a ``data`` mesh axis, keep params replicated, and let XLA compile the
gradient all-reduce as a ``psum`` over ICI.

The second mesh axis (``model``) optionally carries **spatial
partitioning**: image height is sharded over it (``P("data", None,
"model")`` on ``[B, T, H, W, C]``) and GSPMD inserts the halo exchanges
the convolutions need. The reference has no analog (its activations must
fit one GPU); here SP divides per-device activation HBM, which is exactly
the resource that caps the fast fully-unrolled scan regime at large
batch/resolution (the measured batch-64 16.38 GiB OOM wall,
ARCHITECTURE.md). Low-dim leaves (actions/states) have no spatial dim and
stay batch-sharded only — the split is keyed on the batch-dict key, not
rank, so stacked multi-step feeds keep working.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, model_parallel: int = 1) -> Mesh:
    """Build a ``(data, model)`` mesh over the given (default: all) devices.

    On a TPU slice the default device order already follows the physical
    torus, so a 1-D data axis rides ICI neighbor links for the all-reduce.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    if model_parallel > 1:
        # The model (spatial) axis must stay INTRA-process: multi-host
        # feeding goes through make_array_from_process_local_data with each
        # process holding full-height local examples (data/loader.py,
        # shard_batch), which cannot assemble an image whose H-shards live
        # on different hosts. The default device order makes model the
        # fastest-varying axis so this holds whenever model_parallel
        # divides the per-process device count — assert it instead of
        # assuming it (r4 advisor finding).
        for row in arr:
            procs = {d.process_index for d in row}
            if len(procs) > 1:
                raise ValueError(
                    f"model axis spans processes {sorted(procs)}; spatial "
                    f"partitioning requires the model axis to stay within "
                    f"one process (use model_parallel <= devices per host, "
                    f"dividing it evenly)"
                )
    return Mesh(arr, ("data", "model"))


def mesh_for_batch(
    batch_size: int,
    devices: Optional[Sequence[jax.Device]] = None,
    spatial: int = 1,
) -> Mesh:
    """Largest data-parallel mesh whose size divides ``batch_size``.

    Small debug batches then use fewer devices instead of erroring; full
    batches use the whole slice. ``spatial=k`` reserves a k-device
    ``model`` axis for spatial partitioning (image height sharded over
    it); the data axis then uses the remaining device budget.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spatial > 1:
        if n % spatial:
            raise ValueError(f"{n} devices not divisible by spatial_shards={spatial}")
        d = n // spatial
        while d > 1 and batch_size % d:
            d -= 1
        return make_mesh(devices[: d * spatial], model_parallel=spatial)
    while n > 1 and batch_size % n:
        n -= 1
    return make_mesh(devices[:n])


def batch_sharding(mesh: Mesh, stacked: bool = False) -> NamedSharding:
    """Sharding for batch arrays; ``stacked=True`` for a leading ``[K]``
    steps axis ahead of the batch dim (multi-step-per-dispatch feed)."""
    return NamedSharding(mesh, P(None, "data") if stacked else P("data"))


def spatial_mesh(mesh: Mesh) -> bool:
    """True when the mesh's ``model`` axis is real (>1) — i.e. image
    height should be spatially sharded over it."""
    return mesh.shape.get("model", 1) > 1


def leaf_spec(key: str, ndim: int, *, spatial: bool, stacked: bool = False) -> P:
    """PartitionSpec for one batch-dict leaf.

    ``images [B,T,H,W,C]`` additionally shard H over ``model`` when
    ``spatial``; low-dim leaves (actions/states, no spatial dims) are
    batch-sharded only. ``stacked`` prepends the unsharded ``[K]``
    steps axis."""
    lead = (None,) if stacked else ()
    if spatial and key == "images" and ndim - len(lead) >= 4:
        return P(*lead, "data", None, "model")
    return P(*lead, "data")


def batch_shardings(
    batch: Dict[str, Any], mesh: Mesh, stacked: bool = False
) -> Dict[str, NamedSharding]:
    """Per-key NamedShardings for a batch dict (spatial-aware)."""
    sp = spatial_mesh(mesh)
    return {
        k: NamedSharding(mesh, leaf_spec(k, v.ndim, spatial=sp, stacked=stacked))
        for k, v in batch.items()
    }


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def validate_spatial_mesh(mesh: Mesh, height: int, width: int) -> None:
    """Reject spatial-shard factors that would degenerate the generator's
    bottleneck: per-shard extent at the deepest scale must cover the 5x5
    ConvLSTM kernels (>=4 rows; parity verified down to exactly 4 —
    tests/test_model_train.py::TestSpatialParallel). 64/128px inputs
    (bottleneck 8) therefore support spatial_shards<=2; 256px <=4."""
    k = mesh.shape.get("model", 1)
    if k <= 1:
        return
    # the generator's own scale rule — ONE source of truth (lazy import:
    # models/savp.py imports nothing from this module's heavy path at call
    # time, but keeping it out of module scope avoids any future cycle)
    from video_prediction_tpu.models.savp import generator_num_scales

    size = min(height, width)
    bottleneck = size >> generator_num_scales(height, width)
    if bottleneck % k or bottleneck // k < 4:
        raise ValueError(
            f"spatial_shards={k} over {height}x{width} inputs leaves "
            f"{bottleneck / k:g} rows per shard at the {bottleneck}px "
            f"bottleneck (< 4, the validated minimum for the 5x5 ConvLSTM "
            f"kernels); use a smaller --spatial_shards"
        )


# ---------------------------------------------------------------------- #
# Spatial-partitioning trace context
# ---------------------------------------------------------------------- #
# Model code is mesh-agnostic; the few places that must OPT OUT of spatial
# sharding (small-extent subnetworks) call ``constrain_data_parallel``,
# which is a no-op unless the train/eval step is being traced under
# ``spatial_trace_mesh``. Why opting out matters: per-shard spatial extents
# below the kernel size are a degenerate GSPMD corner — bisected on
# **XLA:CPU only** (the sole multi-device backend available in this
# single-chip environment): a k=4 stride-2 conv whose kernel is a fused
# computed value (spectral norm's ``w / sigma``) MISCOMPILES when
# per-shard H < k (output off by O(1), not reassociation noise;
# plain-kernel or s=1 or k=3 cases are exact). Whether XLA:TPU shares the
# corner is UNTESTED — do not read this as a TPU-backend diagnosis. (r5:
# the chipless TpuAotCompiler compiles dp1xsp2 train-step executables
# cleanly — sharded generator, halo exchanges, per-device HBM reported;
# scripts/aot_memory.py — but those builds re-constrain the discs exactly
# as production does, so the TPU lowering of the degenerate fused-SN
# shard remains unexercised.) The
# re-constraint is kept because it is near-free (discs+posterior are
# ~12-15% of step time) and removes the corner on every backend either
# way. The generator — 84% of device time and the activation-memory hog
# SP exists for — stays spatially sharded at extents that never
# degenerate (train.py guards the bottleneck extent).
_SPATIAL_TRACE_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "vp_spatial_trace_mesh", default=None
)


@contextlib.contextmanager
def spatial_trace_mesh(mesh: Optional[Mesh]):
    """Mark a tracing region as targeting a spatial mesh (train/step.py)."""
    token = _SPATIAL_TRACE_MESH.set(mesh if (mesh is not None and spatial_mesh(mesh)) else None)
    try:
        yield
    finally:
        _SPATIAL_TRACE_MESH.reset(token)


def constrain_data_parallel(x: jax.Array) -> jax.Array:
    """Re-shard ``x`` to batch-dim-only data parallelism when tracing under
    a spatial mesh; identity otherwise (single-device, DP-only, eval)."""
    mesh = _SPATIAL_TRACE_MESH.get()
    if mesh is None or x.ndim == 0:
        return x
    spec = P(*(("data",) + (None,) * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Shard a host batch with the leading dim over ``data`` (and image
    height over ``model`` when the mesh's second axis is real).

    Multi-host: ``batch`` is this process's LOCAL shard (``per_host_batch``
    examples) and the global array is assembled across hosts; single-host:
    a plain sharded device_put."""
    shs = batch_shardings(batch, mesh)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(shs[k], v)
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, shs[k]) for k, v in batch.items()}
