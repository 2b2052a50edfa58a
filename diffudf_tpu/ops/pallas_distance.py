"""Pallas TPU kernel: brute-force point→point-cloud minimum distance.

The training sampler's GT oracle (`data/mesh_distance.point_cloud_distance`)
computes min‖q − x‖ over a 100k-point surface cloud for ~10k queries per
step.  The XLA formulation materialises (tile, N) distance blocks in HBM;
here the whole cloud sits in VMEM (100k × 3 floats ≈ 1.2 MB) and each query
tile scans it in VMEM-resident chunks with a running minimum — the only HBM
traffic is queries in, distances out.

This is the kernel SURVEY §2 nominates for the reference's
``shortestDistance`` (``src/dataset.py:72-78``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CLOUD_CHUNK = 2048
_FAR = 1e15


def _min_dist_kernel(q_ref, cloud_ref, csq_ref, out_ref, *, n_chunks: int):
    q = q_ref[:]  # (Tq, 3)
    qq = jnp.sum(q * q, axis=1, keepdims=True)  # (Tq, 1)

    def body(i, best):
        c = cloud_ref[pl.ds(i * _CLOUD_CHUNK, _CLOUD_CHUNK), :]  # (CC, 3)
        cs = csq_ref[pl.ds(i * _CLOUD_CHUNK, _CLOUD_CHUNK), :]  # (CC, 1)
        cross = jnp.dot(q, c.T, preferred_element_type=jnp.float32)  # (Tq, CC)
        d = cs[:, 0][None, :] - 2.0 * cross
        return jnp.minimum(best, jnp.min(d, axis=1, keepdims=True))

    best = lax.fori_loop(
        0, n_chunks, body, jnp.full(qq.shape, jnp.inf, jnp.float32)
    )
    d = jnp.sqrt(jnp.maximum(best + qq, 0.0))  # (Tq, 1)
    out_ref[:] = jnp.broadcast_to(d, out_ref.shape)


@partial(jax.jit, static_argnames=("tile",))
def min_distance_pallas(queries, cloud, tile: int = 512):
    """queries (Q, 3), cloud (N, 3) -> (Q,) exact min Euclidean distance.

    Q is padded to the tile internally; the cloud is padded to the chunk
    size with far-away sentinels.
    """
    queries = jnp.asarray(queries, jnp.float32)
    cloud = jnp.asarray(cloud, jnp.float32)
    q = queries.shape[0]
    n = cloud.shape[0]
    q_pad = (-q) % tile
    if q_pad:
        queries = jnp.concatenate(
            [queries, jnp.zeros((q_pad, 3), jnp.float32)], axis=0
        )
    n_pad = (-n) % _CLOUD_CHUNK
    if n_pad:
        cloud = jnp.concatenate(
            [cloud, jnp.full((n_pad, 3), _FAR, jnp.float32)], axis=0
        )
    csq = jnp.sum(cloud * cloud, axis=1, keepdims=True)
    n_chunks = cloud.shape[0] // _CLOUD_CHUNK

    out = pl.pallas_call(
        partial(_min_dist_kernel, n_chunks=n_chunks),
        grid=((q + q_pad) // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q + q_pad, 8), jnp.float32),
    )(queries, cloud, csq)
    return out[:q, 0]
