"""Multi-host (multi-slice) initialization helpers.

The reference is single-process (SURVEY.md §2.4); this build's
distributed layer (parallel/sharding.py) is SPMD over whatever mesh jax
sees. Across hosts, the only additional requirement is runtime
initialization — after `initialize()` every host sees the global device
set and the same `shard_map` programs run with ICI collectives inside a
slice and DCN collectives across slices (XLA picks transports; the
mesh's `data` axis should be laid out so the ring/psum stay intra-slice
where possible: order devices slice-major, which `make_global_mesh`
does).

Untestable in this single-host image — kept deliberately thin: one call
into jax.distributed plus mesh construction, no bespoke transport code
(that would be re-implementing NCCL bootstrap, which is exactly what the
TPU stack already does better).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .sharding import AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the multi-host runtime (idempotent on single host).

    With TPU pod metadata available, bare `jax.distributed.initialize()`
    autodiscovers everything; arguments are for manual/DCN setups.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-host / no coordinator: run local
        pass


def make_global_mesh(axis: str = AXIS) -> Mesh:
    """1-D data mesh over ALL global devices, slice-major ordered so that
    neighboring ring positions share a slice (ppermute rides ICI; only
    the slice-boundary hops cross DCN)."""
    devs = sorted(
        jax.devices(),
        key=lambda d: (getattr(d, "slice_index", 0), d.id),
    )
    return Mesh(np.asarray(devs), axis_names=(axis,))
