"""Chamfer distance + normal consistency, on device.

Mirrors pytorch3d ``chamfer_distance`` semantics (used by the reference
benchmark driver, ``cuantitative.py:10-19``):

  * per-point distance under ``norm``: Σ|Δ|  (norm=1) or Σ Δ²  (norm=2, i.e.
    *squared* Euclidean, no root) — nearest neighbours are found under the
    same norm;
  * chamfer = mean_x d(x→NN(y)) + mean_y d(y→NN(x))  (sum of both directional
    means);
  * normal consistency loss = mean_x (1 − |cos(n_x, n_NN)|) + mean_y (…)
    (``abs_cosine=True`` semantics).

Implementation: running (min, argmin) over reference-cloud chunks inside a
``lax.scan`` — the Q×N distance matrix never materialises; the L2 path uses
an MXU matmul per (tile × chunk) block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.buckets import next_bucket


@partial(jax.jit, static_argnames=("norm", "y_chunk"))
def _nn_scan(x, y, norm: int, y_chunk: int):
    """x: (Q, 3), y: (M, 3) with M % y_chunk == 0 -> (dists (Q,), idx (Q,))."""
    q = x.shape[0]
    m = y.shape[0]
    chunks = y.reshape(m // y_chunk, y_chunk, 3)

    def body(carry, inp):
        best_d, best_i = carry
        yc, base = inp
        if norm == 2:
            # explicit f32 matmul precision: the TPU default's bf16
            # downcast injects ~1e-2-scale noise into squared distances
            cross = jnp.dot(x, yc.T, precision="float32")
            d = (
                jnp.sum(x * x, axis=1, keepdims=True)
                - 2.0 * cross
                + jnp.sum(yc * yc, axis=1)[None, :]
            )
        else:
            d = jnp.sum(jnp.abs(x[:, None, :] - yc[None, :, :]), axis=-1)
        local_i = jnp.argmin(d, axis=1)
        local_d = jnp.take_along_axis(d, local_i[:, None], axis=1)[:, 0]
        better = local_d < best_d
        return (
            jnp.where(better, local_d, best_d),
            jnp.where(better, base + local_i, best_i),
        ), None

    init = (jnp.full((q,), jnp.inf, x.dtype), jnp.zeros((q,), jnp.int32))
    bases = jnp.arange(0, m, y_chunk, dtype=jnp.int32)
    (d, i), _ = lax.scan(body, init, (chunks, bases))
    return jnp.maximum(d, 0.0), i


def _bucket(n: int) -> int:
    """Next power of two (min 256): pads query/reference lengths so meshes
    with different vertex counts share one compiled executable — a remote
    TPU compile costs 20-40 s, the padded rows cost microseconds."""
    return next_bucket(n, 256)


def nearest_neighbor(x, y, norm: int = 2, y_chunk: int = 4096):
    """-> (distances (Q,) under ``norm``, indices (Q,) into y)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    q = x.shape[0]
    qb = _bucket(q)
    if qb > q:
        x = jnp.concatenate([x, jnp.full((qb - q, 3), 2e9, x.dtype)])
    m = y.shape[0]
    # bucket for compile sharing, then round up to a multiple of y_chunk so
    # the scan reshape is exact for any chunk length (not just powers of two)
    target = max(_bucket(m), y_chunk)
    target = -(-target // y_chunk) * y_chunk
    if target > m:
        filler = jnp.full((target - m, 3), 1e9, y.dtype)
        y = jnp.concatenate([y, filler])
    d, i = _nn_scan(x, y, norm, y_chunk)
    return d[:q], i[:q]


def _host_kdtree_ok() -> bool:
    try:
        from scipy.spatial import cKDTree  # noqa: F401
    except Exception:  # pragma: no cover - scipy is in the baked image
        return False
    return True


def _nn_host(x, y, norm: int):
    """Exact NN via a host k-d tree (Minkowski p = norm, so the neighbour
    set matches the device scan); distances follow pytorch3d conventions
    (L2 = *squared* Euclidean)."""
    import numpy as _np
    from scipy.spatial import cKDTree

    d, i = cKDTree(y).query(x, p=norm, workers=-1)
    if norm == 2:
        d = d * d
    return _np.asarray(d, _np.float32), i


def chamfer_distance(x, y, x_normals=None, y_normals=None, norm: int = 2,
                     backend: str = "auto"):
    """-> (chamfer, normal_consistency_loss or None).  Scalars as floats.

    backend: 'device' = the chunked TPU scan (sharded-eval path);
    'host' = exact scipy k-d tree (~10× faster for metric-sized clouds on
    this box — NN under the same Minkowski norm, identical result up to
    tie-breaking order); 'auto' picks host for host-resident inputs when
    scipy is available, device otherwise.  Both backends are pinned by
    ``tests/test_golden_metrics.py``.
    """
    import numpy as _np

    if backend == "auto":
        on_host = not (isinstance(x, jax.Array) or isinstance(y, jax.Array))
        backend = "host" if on_host and _host_kdtree_ok() else "device"
    if backend == "host":
        xh = _np.asarray(x, _np.float32)
        yh = _np.asarray(y, _np.float32)
        dx, ix = _nn_host(xh, yh, norm)
        dy, iy = _nn_host(yh, xh, norm)
        cd = float(_np.mean(dx, dtype=_np.float64)
                   + _np.mean(dy, dtype=_np.float64))
        nc = None
        if x_normals is not None and y_normals is not None:
            xn = _np.asarray(x_normals, _np.float32)
            yn = _np.asarray(y_normals, _np.float32)

            def _ncdir_np(an, bn, idx):
                bsel = bn[idx]
                cos = _np.sum(an * bsel, axis=1) / _np.maximum(
                    _np.linalg.norm(an, axis=1) * _np.linalg.norm(bsel, axis=1),
                    1e-12,
                )
                return _np.mean(1.0 - _np.abs(cos), dtype=_np.float64)

            nc = float(_ncdir_np(xn, yn, ix) + _ncdir_np(yn, xn, iy))
        return cd, nc

    dx, ix = nearest_neighbor(x, y, norm)
    dy, iy = nearest_neighbor(y, x, norm)
    cd = float(jnp.mean(dx) + jnp.mean(dy))
    nc = None
    if x_normals is not None and y_normals is not None:
        xn = jnp.asarray(x_normals, jnp.float32)
        yn = jnp.asarray(y_normals, jnp.float32)

        def _ncdir(an, bn, idx):
            bsel = bn[idx]
            cos = jnp.sum(an * bsel, axis=1) / jnp.maximum(
                jnp.linalg.norm(an, axis=1) * jnp.linalg.norm(bsel, axis=1), 1e-12
            )
            return jnp.mean(1.0 - jnp.abs(cos))

        nc = float(_ncdir(xn, yn, ix) + _ncdir(yn, xn, iy))
    return cd, nc


def protocol_floor(mesh, n_samples: int = 100000, seeds=(1, 2), norm: int = 1):
    """-> (chamfer_floor, nc_floor): the metric's resolution limit on a shape.

    Two *independent* surface samplings of the same ground-truth mesh,
    compared under the benchmark protocol (``cuantitative.py:10-19``
    conventions), bound what any reconstruction can score: nearest-neighbor
    distances never vanish at finite sampling density, and normals of
    nearest (but not identical) points disagree wherever curvature is
    non-zero.  On the reference's beetle at 100k samples the floor is
    Chamfer-L1 ≈ 6.1e-3 and NC ≈ 0.028 — context for the published garment
    numbers, which come from denser/smoother shapes.
    """
    from ..data.sampling import sample_surface_points

    p1, n1 = sample_surface_points(mesh, n_samples, seed=seeds[0])
    p2, n2 = sample_surface_points(mesh, n_samples, seed=seeds[1])
    return chamfer_distance(p1, p2, n1, n2, norm=norm)
