"""Double-buffered host->device feed.

The reference's input pipeline ends at ``iterator.get_next()`` inside the
TF graph; our equivalent overlaps host batch preparation and H2D transfer
with device compute: a background thread pulls numpy batches from the
dataset iterator and ``jax.device_put``s them (sharded over the mesh's
``data`` axis) ahead of consumption, so the TPU never waits on the host
(SURVEY §7 "input pipeline throughput" hard part #5).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import jax
from jax.sharding import Mesh

from video_prediction_tpu.parallel.mesh import batch_shardings


class DeviceFeeder:
    """Background-thread prefetcher: numpy iterator -> on-device batches."""

    def __init__(
        self,
        host_iterator: Iterator[Dict[str, Any]],
        mesh: Optional[Mesh] = None,
        prefetch: int = 2,
        stack: int = 1,
    ):
        """``stack=K`` groups K consecutive host batches into one device
        array with a leading ``[K]`` axis, for multi-step-per-dispatch
        training (``make_train_step(steps_per_call=K)``)."""
        if stack > 1:
            host_iterator = _stack_batches(host_iterator, stack)
        self._it = host_iterator
        # size-1 mesh: plain device_put (NamedSharding adds no information
        # and keeps arrays off the backend's pathologically slow
        # annotated-arg path; see train/step.py)
        self._mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self._stacked = stack > 1
        self._shardings = None  # per-key, resolved from the first batch
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        try:
            multi_host = jax.process_count() > 1
            for batch in self._it:
                if self._stop.is_set():
                    return
                if self._mesh is not None:
                    if self._shardings is None:
                        # per-key shardings (image height additionally rides
                        # the mesh's ``model`` axis when it is real —
                        # spatial partitioning, parallel/mesh.py)
                        self._shardings = batch_shardings(
                            batch, self._mesh, stacked=self._stacked
                        )
                    if multi_host:
                        # each process feeds only its LOCAL shard (the host
                        # iterator yields per_host_batch examples); this
                        # assembles the global array across hosts —
                        # device_put with a global sharding would reject
                        # non-addressable devices
                        batch = {
                            k: jax.make_array_from_process_local_data(
                                self._shardings[k], v
                            )
                            for k, v in batch.items()
                        }
                    else:
                        batch = {
                            k: jax.device_put(v, self._shardings[k])
                            for k, v in batch.items()
                        }
                else:
                    batch = jax.tree_util.tree_map(jax.device_put, batch)
                self._q.put(batch)
            self._q.put(None)  # sentinel: iterator exhausted -> StopIteration
        except BaseException as e:  # surfaced on next __next__
            self._err = e
            self._q.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()


def _stack_batches(it: Iterator[Dict[str, Any]], k: int) -> Iterator[Dict[str, Any]]:
    """Group k consecutive batches into one with a leading [k] axis."""
    import numpy as np

    while True:
        group = []
        for _ in range(k):
            try:
                group.append(next(it))
            except StopIteration:
                return
        yield {key: np.stack([g[key] for g in group]) for key in group[0]}
