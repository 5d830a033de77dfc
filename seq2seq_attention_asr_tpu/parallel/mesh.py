"""Device mesh + sharding helpers — the TPU-native 'communication backend'.

The reference has no distributed layer at all (SURVEY.md §2.6: one GPU
selected via cutorch.setDevice, timit/timit.lua:39). Here the
equivalent of an NCCL backend is a `jax.sharding.Mesh` over the slice
with named axes:

  - "dp": data parallelism over utterance batches (gradients psum over
    ICI automatically under jit-with-shardings);
  - "sp": sequence sharding of encoder states for the attention
    energy/context computation (collectives inserted explicitly in
    ops/attention.py via axis_name).

Conventions: batches are sharded P("dp") on their leading axis; params
and scalar metrics are replicated; encoder annotations are resharded
P("dp", "sp") before the decoder when sp > 1.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
SEQ_AXIS = "sp"


def make_mesh(
    dp: Optional[int] = None,
    sp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh of shape (dp, sp); dp defaults to n_devices // sp.

    On a multi-host slice this uses all global devices (standard SPMD:
    every host runs the same program; `jax.distributed.initialize` must
    have been called by the launcher first — see parallel/multihost.py).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp}*{sp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for host batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def annotation_sharding(mesh: Mesh) -> NamedSharding:
    """(B, L, A) encoder annotations: batch over dp, positions over sp."""
    return NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))


def put_batch(mesh: Mesh, tree):
    """Device_put a host batch pytree with dp sharding on axis 0."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


def put_replicated(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


def pad_batch_to(tree, batch: int):
    """Pad a host batch pytree's leading axis up to `batch` (so uneven
    final batches still divide the dp axis); returns (tree, real_n)."""
    import numpy as np

    def pad(a):
        n = a.shape[0]
        if n == batch:
            return a
        reps = np.zeros((batch - n,) + a.shape[1:], a.dtype)
        return np.concatenate([a, reps], axis=0)

    n = jax.tree.leaves(tree)[0].shape[0]
    return jax.tree.map(pad, tree), n
