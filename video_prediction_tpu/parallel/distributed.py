"""Multi-host initialization (DCN scale-out).

The reference is strictly single-process (SURVEY §2.3 — in-graph GPU
towers, no multi-worker support). Our replacement scales past one host
with the standard JAX recipe: ``jax.distributed.initialize`` connects the
hosts, after which the SAME mesh + sharding annotations in
``parallel/mesh.py`` span all chips — the train step code does not change;
XLA routes the gradient all-reduce over ICI within a slice and DCN across
slices.

``maybe_initialize()`` is called by the train CLI and is a no-op unless a
multi-host environment is detected (JAX_COORDINATOR_ADDRESS set, or a
recognized cluster env such as TPU pod metadata), so single-host runs are
untouched.
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when configured; returns True if done.

    Resolution order: explicit args -> JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars -> cluster auto-detection
    (``jax.distributed.initialize()`` with no args works on TPU pods).
    """
    import jax

    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else _int_env("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if coord:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid
        )
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES") and _int_env("TPU_WORKER_ID") is not None and nproc:
        # TPU pod: let jax auto-detect from the cluster environment
        jax.distributed.initialize()
        return True
    return False


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else None


def per_host_batch(global_batch: int) -> int:
    """Split a global batch across hosts (each host feeds its local shard;
    the mesh's ``data`` axis spans all devices of all hosts)."""
    import jax

    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n
