"""Device-mesh and sharding helpers — the framework's entire "comm backend".

The reference has no parallelism (SURVEY §2); scaling here is pure SPMD over
a 1-D ``jax.sharding.Mesh`` with a ``data`` axis:

  * parameters (a ~460k-param MLP) are replicated on every chip,
  * batch / grid / ray axes are sharded along ``data``,
  * XLA inserts the gradient ``psum`` and any resharding collectives over ICI
    automatically from the sharding annotations — no hand-written NCCL/MPI
    analogue exists or is needed.

Everything degrades to no-ops on a single device, so the same train/eval code
runs on 1 real chip or an N-chip mesh unchanged.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_spec(ndim: int) -> P:
    """PartitionSpec sharding the leading (batch) axis only."""
    return P(DATA_AXIS, *([None] * (ndim - 1)))


def shard_batch(x, mesh: Mesh):
    """Constrain a batched array (leading axis) to be sharded across the mesh.

    Inside jit this makes XLA split the downstream compute across chips;
    a 1-device mesh makes it a no-op.
    """
    if mesh.size == 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, batch_spec(x.ndim))
    )


def replicate(x, mesh: Mesh):
    """Constrain an array (e.g. params) to be replicated on every device."""
    if mesh.size == 1:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
