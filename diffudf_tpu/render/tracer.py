"""On-device sphere tracing and hit-point differential geometry.

TPU re-design of ``src/render_st.py:136-172``: the reference marches rays in
4096-point chunks with a host↔device round trip *per iteration* (boolean
indexing of the active set on the CPU).  Here the entire ray tensor lives on
device inside one ``lax.while_loop`` — fixed shapes, per-ray active masks,
early exit when no ray is active — which is the main lever behind the ≥10×
rays/sec target (BASELINE.md).

Hit attributes (normals from the Hessian top eigenvector, principal
directions, mean/gaussian curvature of the *normal field*) are computed in a
second fused pass; the curvature path needs the Jacobian of the
Hessian-eigenvector field — third derivatives of f — obtained by forward-mode
(jacfwd) through the closed-form eigensolver, replacing the reference's
autograd-through-``torch.linalg.eigh`` (``render_st.py:42-62``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..autodiff.eigh3 import eigh3x3
from ..autodiff.ops import value, value_grad, value_grad_hessian
from ..fields.siren import SirenSpec
from ..fields.transforms import inverse_map


@partial(
    jax.jit,
    static_argnames=("spec", "gt_mode", "max_iterations"),
)
def trace_rays(
    params,
    spec: SirenSpec,
    origins,  # (N, 3) entry points into the domain
    rays,  # (N, 3) unit directions
    active0,  # (N,) bool: rays that entered the domain
    *,
    gt_mode: str,
    alpha: float,
    surface_threshold: float,
    max_iterations: int = 100,
):
    """March ``t ← t + ray · inverse(|f(t)|)`` until convergence.

    Returns (positions (N, 3), hits (N,) bool, iterations used).
    Reference loop semantics (``render_st.py:136-161``): a ray hits when its
    step (or field value, in siren mode) drops below the threshold while
    still inside [-1, 1]³; it dies when it leaves the domain.
    """

    def cond(carry):
        t0, active, hits, it = carry
        return jnp.logical_and(it < max_iterations, jnp.any(active))

    def body(carry):
        t0, active, hits, it = carry
        f = value(params, spec, t0)
        steps = inverse_map(gt_mode, jnp.abs(f), alpha)
        t1 = t0 + rays * steps[:, None]
        t0 = jnp.where(active[:, None], t1, t0)

        if gt_mode == "siren":
            thresh = f < surface_threshold
        else:
            thresh = jnp.abs(steps) < surface_threshold
        in_domain = jnp.all((t0 > -1.0) & (t0 < 1.0), axis=-1)
        hits = hits | (active & thresh & in_domain)
        active = active & ~thresh & in_domain
        return t0, active, hits, it + 1

    n = origins.shape[0]
    init = (
        origins.astype(jnp.float32),
        active0,
        jnp.zeros((n,), bool),
        jnp.int32(0),
    )
    t0, active, hits, it = lax.while_loop(cond, body, init)
    return t0, hits, it


def gradient_descent_refine(
    params, spec, positions, mask, *, gt_mode, alpha, steps: int
):
    """Optional post-march refinement ``t ← t − ∇̂f · inverse(f)``
    (``render_st.py:163-172``)."""
    if steps == 0:
        return positions

    def body(i, t0):
        f, g = value_grad(params, spec, t0)
        gn = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        step = inverse_map(gt_mode, jnp.abs(f), alpha)
        t1 = t0 - gn * step[:, None]
        return jnp.where(mask[:, None], t1, t0)

    return lax.fori_loop(0, steps, body, positions)


def _normal_field(params, spec, x):
    """Unit Hessian-top-eigenvector field n(x) — differentiable."""
    _, _, h = value_grad_hessian(params, spec, x)
    _, vecs = eigh3x3(h)
    return vecs[..., 2]


@partial(jax.jit, static_argnames=("spec", "curvature_mode", "tile"))
def hit_attributes(
    params,
    spec: SirenSpec,
    positions,  # (N, 3) hit points (padded to tile multiple by caller)
    *,
    curvature_mode: str = "none",  # 'none' | 'mean' | 'gaussian'
    tile: int = 4096,
):
    """-> dict with normals (N,3), pc1 (N,3), pc2 (N,3) [, curvature (N,)].

    normals = Hessian top eigenvector; pc1/pc2 = the other two eigenvectors
    (principal-direction proxies used by Ward shading, ``render_st.py:57-62``).
    Curvature follows the reference's shape-operator form on the normal
    field: mean = ½ tr(∂n/∂x), gaussian = −det of the bordered Jacobian
    (``render_st.py:42-55``).
    """
    n = positions.shape[0]
    tiles = positions.reshape(n // tile, tile, 3)

    def one(pts):
        _, _, h = value_grad_hessian(params, spec, pts)
        _, vecs = eigh3x3(h)
        normals = vecs[..., 2]
        out = {"normals": normals, "pc1": vecs[..., 0], "pc2": vecs[..., 1]}
        if curvature_mode == "none":
            out["curvature"] = jnp.zeros(pts.shape[0])
            return out

        def nf(p):
            return _normal_field(params, spec, p[None, :])[0]

        jac = jax.vmap(jax.jacfwd(nf))(pts)  # (tile, 3, 3)
        if curvature_mode == "mean":
            curv = 0.5 * jnp.trace(jac, axis1=-2, axis2=-1)
        else:  # gaussian: bordered-Jacobian determinant
            F = jnp.zeros((pts.shape[0], 4, 4))
            F = F.at[:, :3, :3].set(jac)
            F = F.at[:, :3, 3].set(normals)
            F = F.at[:, 3, :3].set(normals)
            curv = -jnp.linalg.det(F)
        out["curvature"] = curv
        return out

    outs = lax.map(one, tiles)
    return {k: v.reshape(n, *v.shape[2:]) for k, v in outs.items()}
