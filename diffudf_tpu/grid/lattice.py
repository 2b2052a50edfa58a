"""Dense N³ lattice evaluation → pseudo-UDF + direction field.

TPU re-design of the reference grid extraction (``src/render_mc.py:20-101``):
the lattice is generated on device, evaluated with the fused (f, ∇f, H) tile
map (sharded across chips on a mesh), and converted to

  * ``udf``  — inverse-mapped pseudo Euclidean distance |g⁻¹(|f|)|,
  * ``dirs`` — unit direction field: −∇f/|∇f| where the gradient is
    informative, else the Hessian top eigenvector sign-aligned with −∇f
    (the paper's near-surface fallback where ∇(UDF) vanishes).

Grid memory layout matches the reference: ``udf[i, j, k]`` at coordinate
(x_i, y_j, z_k), x slowest / z fastest, over [-1, 1]³ with spacing 2/(N−1).

Deviation (documented): the reference checks the gradient-norm threshold
*after* normalising the gradient (``render_mc.py:75,86``), which makes the
Hessian fallback unreachable except at exactly-zero gradients; we apply the
intended pre-normalisation threshold ``|∇f| < 0.04`` — the behaviour of the
reference's own slice renderer (``generate_df.py:84,96-100``) and of the
paper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..autodiff.eigh3 import top_eigenvector
from ..fields.siren import SirenSpec
from ..fields.transforms import inverse_map
from ..ops.evaluate import evaluate_field

GRAD_NORM_THRESHOLD = 0.04


def lattice_points(N: int, origin: float = -1.0, extent: float = 2.0) -> jax.Array:
    """(N³, 3) lattice, x slowest / z fastest, float32, built on device."""
    axis = origin + extent / (N - 1) * jnp.arange(N, dtype=jnp.float32)
    x, y, z = jnp.meshgrid(axis, axis, axis, indexing="ij")
    return jnp.stack([x.ravel(), y.ravel(), z.ravel()], axis=-1)


def direction_field(grad, hess, threshold: float = GRAD_NORM_THRESHOLD):
    """Unit directions toward the surface from (∇f, H): (Q,3),(Q,3,3)->(Q,3)."""
    gnorm = jnp.linalg.norm(grad, axis=-1, keepdims=True)
    ndir = -grad / jnp.maximum(gnorm, 1e-12)
    hnormal = top_eigenvector(hess)
    # sign-align the eigenvector with the inward gradient direction
    sign = jnp.where(jnp.sum(ndir * hnormal, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    hnormal = sign * hnormal
    return jnp.where(gnorm < threshold, hnormal, ndir)


def extract_fields(
    params,
    spec: SirenSpec,
    N: int,
    gt_mode: str,
    alpha: float,
    *,
    mesh=None,
    tile: int = 8192,
    deriv_dtype=jnp.bfloat16,
):
    """-> (udf (N, N, N) f32, dirs (N, N, N, 3) f32), both on device.

    ``deriv_dtype`` defaults to bf16 here: the direction field only needs
    directional accuracy (~0.4% noise ≪ voxel effects) and the value path
    (which sets vertex positions via the pseudo-UDF) stays f32 regardless.
    """
    pts = lattice_points(N)
    ev = evaluate_field(
        params, spec, pts, want_grad=True, want_hess=True, tile=tile, mesh=mesh,
        deriv_dtype=deriv_dtype,
    )
    udf = inverse_map(gt_mode, jnp.abs(ev.f), alpha)
    dirs = direction_field(ev.grad, ev.hess)
    return udf.reshape(N, N, N), dirs.reshape(N, N, N, 3)


def extract_sdf_grid(params, spec: SirenSpec, N: int, *, mesh=None, tile: int = 8192):
    """Raw field values on the lattice (signed-MC baseline path,
    ``src/render_mc.py:314-358``)."""
    pts = lattice_points(N)
    ev = evaluate_field(params, spec, pts, tile=tile, mesh=mesh)
    return ev.f.reshape(N, N, N)
