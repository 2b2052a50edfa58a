"""Field-guided refinement of extracted mesh vertices.

Marching-cubes vertices are linear interpolations on a voxel lattice: even
with exact corner values they carry O(voxel) staircase noise, which is the
dominant term in vertex-normal error (normal consistency) at N=256.  The
trained field itself is far more accurate than the lattice (median surface
error ~1e-3 ≪ voxel/2 = 3.9e-3, PERFORMANCE.md), so projecting each vertex
onto the zero set with the same step the point-cloud sampler uses
(``x ← x − inverse(|f|)·∇̂f``, reference ``src/render_pc.py:43-53``) removes
most of that noise.

This is a *refinement the reference does not perform* — its meshes keep the
raw MC vertices.  It is therefore opt-in from the extraction drivers
(``generate_mc`` config key ``refine_vertices``); topology is untouched and
a trust region bounds each vertex to a fraction of a voxel so triangles
cannot collapse or fold.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..autodiff.ops import value_grad
from ..fields.siren import SirenSpec
from ..fields.transforms import inverse_map


@partial(jax.jit, static_argnames=("spec", "gt_mode", "steps"))
def _refine(params, spec: SirenSpec, x0, *, gt_mode, alpha, steps, max_move):
    def body(i, x):
        f, g = value_grad(params, spec, x)
        gn = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        d = inverse_map(gt_mode, jnp.abs(f), alpha, min_step=0.0)
        # per-step trust region: never move more than the remaining budget
        step = jnp.minimum(d, max_move)
        return x - step[:, None] * gn

    x = lax.fori_loop(0, steps, body, x0)
    # global trust region: total displacement capped at max_move
    delta = x - x0
    norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, max_move / jnp.maximum(norm, 1e-12))
    return x0 + delta * scale


def refine_vertices(
    params,
    spec: SirenSpec,
    verts: np.ndarray,
    *,
    gt_mode: str,
    alpha: float,
    N: int,
    steps: int = 2,
    max_move_voxels: float = 0.5,
    tile: int = 8192,
) -> np.ndarray:
    """Project mesh vertices onto the field's zero set (bounded move).

    verts: (V, 3) in [-1, 1]³ from an N³ extraction.  Returns refined
    vertices (numpy); faces are unchanged by construction.
    """
    if len(verts) == 0 or steps <= 0:
        return verts
    voxel = 2.0 / (N - 1)
    max_move = np.float32(max_move_voxels * voxel)
    v = np.asarray(verts, np.float32)
    n = len(v)
    # pad to a power-of-4 bucket of ``tile``: every distinct padded length
    # is a fresh XLA compile (20-40 s remote), so meshes of different sizes
    # must share a small executable set
    from ..utils.buckets import next_bucket

    cap = next_bucket(n, tile, factor=4)
    if cap > n:
        v = np.concatenate([v, np.zeros((cap - n, 3), np.float32)])
    out = _refine(
        params, spec, jnp.asarray(v), gt_mode=gt_mode, alpha=alpha,
        steps=steps, max_move=max_move,
    )
    return np.asarray(out)[:n]
