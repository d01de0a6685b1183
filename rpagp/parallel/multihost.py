"""Multi-host (multi-process / DCN) runtime layer.

The reference is single-process (SURVEY.md §2.4); this build's
distributed layer (parallel/sharding.py) is SPMD over whatever mesh jax
sees, so crossing hosts needs exactly three things, all here:

1. `initialize()` — bring up the jax distributed runtime BEFORE the
   backend is touched (coordinator + Gloo/ICI collectives). After it,
   every process sees the global device set and the same `shard_map`
   programs run with ICI collectives inside a slice and DCN/Gloo
   collectives across processes.
2. `make_global_mesh()` — slice-major device order so ring/psum
   neighbors share a slice where possible.
3. `shard_rows_global()` / `replicate_global()` — build global
   `jax.Array`s from host-side numpy data. `jax.device_put` (what
   single-process `sharding.shard_rows` uses) only addresses local
   devices; across processes the array must be assembled from each
   process's addressable shards (`jax.make_array_from_callback`).
   Both helpers work identically in single-process mode, so callers
   can be written once.

Verified end-to-end in this image by `tests/test_multihost.py`: two
OS processes x 4 virtual CPU devices each run the exact grid-space
training step (scripts/multihost_worker.py) and the loss trajectory
matches the single-process 8-device mesh to f32 roundoff (the grid
step has ZERO per-step collectives — only the per-dataset prepare
psums cross the process boundary).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               **kwargs) -> None:
    """Bring up the multi-process runtime (idempotent).

    MUST run before anything initializes the jax backend — even
    `jax.process_count()` does, which is why this guard checks the
    distributed client directly instead of asking the backend (the
    previous version called `jax.process_count()` first and thereby
    always fell back to single-process).

    With TPU pod metadata available, bare `initialize()` autodiscovers
    everything; the explicit arguments are for manual/DCN setups
    (e.g. ``coordinator_address="10.0.0.1:1234", num_processes=2,
    process_id=i``). Extra kwargs pass through to
    `jax.distributed.initialize` (timeouts, local_device_ids, ...).
    """
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except (ValueError, RuntimeError):
        if num_processes is not None and num_processes > 1:
            raise  # an explicit multi-process setup must not run local
        # single-host / no coordinator metadata: run local
        pass


def make_global_mesh(axis: str = AXIS) -> Mesh:
    """1-D data mesh over ALL global devices, slice-major ordered so that
    neighboring ring positions share a slice (ppermute rides ICI; only
    the slice-boundary hops cross DCN)."""
    devs = sorted(
        jax.devices(),
        key=lambda d: (getattr(d, "slice_index", 0) or 0,
                       getattr(d, "process_index", 0), d.id),
    )
    return Mesh(np.asarray(devs), axis_names=(axis,))


def shard_rows_global(arr, mesh: Mesh):
    """Row-shard host data over the mesh's first axis, multi-process
    safe.

    `arr` is the FULL array, host-replicated (every process passes the
    same value — cheap for the host-side loaders in utils/datasets,
    which are deterministic per seed). Each process materializes only
    its addressable shards; nothing is transferred between hosts.
    Single-process this is equivalent to `sharding.shard_rows`.
    """
    arr = np.asarray(arr)
    spec = P(mesh.axis_names[0], *([None] * (arr.ndim - 1)))
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sh,
                                        lambda idx: arr[idx])


def replicate_global(tree, mesh: Mesh):
    """Replicate a pytree of host data onto every device of a (possibly
    multi-process) mesh. Multi-process-safe analog of
    `sharding.replicate`."""
    sh = NamedSharding(mesh, P())

    def _one(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    return jax.tree.map(_one, tree)


def process_zero() -> bool:
    """True on the process that should own logging/CSV/checkpoint IO."""
    return jax.process_index() == 0
