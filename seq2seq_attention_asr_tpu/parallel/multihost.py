"""Multi-host SPMD launch + per-host data sharding.

The reference is single-process (SURVEY.md §2.6). On a multi-host TPU
slice every host runs the same program: `initialize()` wires
jax.distributed (coordinator discovery via env or explicit args), and
`host_shard(ds)` gives each host its slice of the dataset so the
global batch assembles across hosts under the "dp" mesh axis
(jax.make_array_from_process_local_data handles the host->global
array stitching).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with pass-through args; no-op when
    single-process (num_processes == 1 or already initialized).

    The already-initialized probe must NOT touch the backend —
    jax.process_count() would initialise XLA and make
    jax.distributed.initialize impossible ("must be called before any
    JAX calls") — so it inspects the distributed global state instead.
    """
    try:
        # Private-API probe; guarded so a JAX relayout degrades to the
        # RuntimeError fallback below instead of a crash or a silent
        # always-False check.
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized by the launcher
    except Exception:
        pass
    if num_processes in (None, 1) and coordinator_address is None:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # Tolerate a launcher that already initialized the service.
        if "already" not in str(e).lower():
            raise


def host_shard(ds, process_id: Optional[int] = None, process_count: Optional[int] = None):
    """Deterministic per-host dataset slice (utterance-level round robin).

    Each host feeds its local slice to the batcher; with batch
    sharding P("dp") the global batch is the concatenation across
    hosts."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    if n <= 1:
        return ds
    import dataclasses

    idx = list(range(pid, len(ds), n))
    return dataclasses.replace(
        ds,
        uids=[ds.uids[i] for i in idx],
        x=[ds.x[i] for i in idx],
        y=[ds.y[i] for i in idx],
        y39=None if ds.y39 is None else [ds.y39[i] for i in idx],
        start=[ds.start[i] for i in idx],
        finish=[ds.finish[i] for i in idx],
    )


def global_batch(mesh, local_arrays):
    """Assemble a global device array from per-host local batch shards
    via jax.make_array_from_process_local_data (host-local leading axis
    -> global dp-sharded axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import DATA_AXIS

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
        local_arrays,
    )
