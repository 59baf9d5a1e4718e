"""Device mesh + sharding helpers: the data-parallel layer.

This module *replaces* the reference's entire multi-GPU tower subsystem
(``base_model.py`` tower split + ``utils/tf_utils.py#
compute_averaged_gradients`` + ``local_device_setter``): we shard the batch
over a ``data`` mesh axis, keep params replicated, and let XLA compile the
gradient all-reduce as a ``psum`` over ICI. A ``model`` axis is reserved for
future tensor parallelism (unused at this model scale, mesh size 1).
"""

from __future__ import annotations

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
    return Mesh(arr, ("data", "model"))


def mesh_for_batch(batch_size: int, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Largest data-parallel mesh whose size divides ``batch_size``.

    Small debug batches then use fewer devices instead of erroring; full
    batches use the whole slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n:
        n -= 1
    return make_mesh(devices[:n])


def batch_sharding(mesh: Mesh, stacked: bool = False) -> NamedSharding:
    """Sharding for batch arrays; ``stacked=True`` for a leading ``[K]``
    steps axis ahead of the batch dim (multi-step-per-dispatch feed)."""
    return NamedSharding(mesh, P(None, "data") if stacked else P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Shard a host batch with the leading dim over ``data``.

    Multi-host: ``batch`` is this process's LOCAL shard (``per_host_batch``
    examples) and the global array is assembled across hosts; single-host:
    a plain sharded device_put."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, x), batch
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
