"""Differential-geometry quantities of the learned implicit surface.

Closed-form curvature formulas evaluated from (∇f, H) — no extra autodiff
passes (the reference re-enters autograd per quantity,
``src/diff_operators.py:7-50``).  For an implicit surface f = const:

  * mean curvature      K_m = ( |∇f|² tr H − ∇fᵀ H ∇f ) / (2 |∇f|³)
                        (equivalently ½ ∇·(∇f/|∇f|), the reference's form,
                        ``src/diff_operators.py:32-38``)
  * gaussian curvature  K_g = − det [[H, ∇f], [∇fᵀ, 0]] / |∇f|⁴
                        (bordered-Hessian form, ``src/diff_operators.py:7-30``)
  * principal curvatures K_m ± sqrt(|K_m² − K_g| + ε)

Sign conventions follow the reference (outward gradient ⇒ sphere of radius r
has K_m = −1/r with ∇f pointing outward... the reference returns
(−Kmax, −Kmin) from ``principal_curvature``; we keep the raw geometric values
and let callers flip).
"""

from __future__ import annotations

import jax.numpy as jnp


def divergence(hess):
    """∇·(∇f) = tr H — the divergence of the gradient field, from the fused
    Hessian (reference ``src/diff_operators.py:201-205`` re-enters autograd
    per component; here it's a trace)."""
    return jnp.trace(hess, axis1=-2, axis2=-1)


def laplacian(hess):
    """Δf = tr H (alias, reference ``diff_operators.py:196-198``)."""
    return divergence(hess)


def vector_field_jacobian(field_fn, x):
    """Jacobian of an R³→R³ field at points x: (N, 3) -> (N, 3, 3).

    Forward-mode per point (``diff_operators.py:214-227`` analogue); used
    for shape operators of normal fields.
    """
    import jax

    return jax.vmap(jax.jacfwd(lambda p: field_fn(p[None, :])[0]))(x)


def mean_curvature(grad, hess):
    """(..., 3), (..., 3, 3) -> (...,). ½ ∇·(∇f/|∇f|) in closed form."""
    gnorm = jnp.linalg.norm(grad, axis=-1)
    g3 = jnp.maximum(gnorm, 1e-12) ** 3
    gHg = jnp.einsum("...i,...ij,...j->...", grad, hess, grad)
    trH = jnp.trace(hess, axis1=-2, axis2=-1)
    return (gnorm**2 * trH - gHg) / (2.0 * g3)


def gaussian_curvature(grad, hess):
    """(..., 3), (..., 3, 3) -> (...,). Bordered-Hessian determinant form."""
    batch = grad.shape[:-1]
    F = jnp.zeros(batch + (4, 4), dtype=grad.dtype)
    F = F.at[..., :3, :3].set(hess)
    F = F.at[..., :3, 3].set(grad)
    F = F.at[..., 3, :3].set(grad)
    gnorm4 = jnp.maximum(jnp.linalg.norm(grad, axis=-1), 1e-12) ** 4
    return -jnp.linalg.det(F) / gnorm4


def principal_curvatures(grad, hess):
    """Returns (k_min, k_max), each (...,)."""
    km = mean_curvature(grad, hess)
    kg = gaussian_curvature(grad, hess)
    a = jnp.sqrt(jnp.abs(km * km - kg) + 1e-5)
    return km - a, km + a


def principal_directions(grad, hess):
    """Principal curvature directions of the implicit surface, closed form.

    Che, Paul & Zhang, "Lines of curvature and umbilical points for implicit
    surfaces" (CAGD 2007) — the formula the reference carries in
    ``src/diff_operators.py:55-94``.  Returns (T1 (..., 3), T2 (..., 3),
    umbilical (...,) bool).  Directions are not normalised (callers
    normalise); at umbilical points any tangent direction is valid.
    """
    g = grad
    h = hess
    gx, gy, gz = g[..., 0:1], g[..., 1:2], g[..., 2:3]

    A = gy * h[..., 0, 2:3] - gz * h[..., 0, 1:2]
    B = 0.5 * (gz * h[..., 0, 0:1] - gx * h[..., 0, 2:3]
               + gy * h[..., 1, 2:3] - gz * h[..., 1, 1:2])
    C = 0.5 * (gy * h[..., 2, 2:3] - gz * h[..., 1, 2:3]
               + gx * h[..., 0, 1:2] - gy * h[..., 0, 0:1])
    D = gz * h[..., 0, 1:2] - gx * h[..., 1, 2:3]
    E = 0.5 * (gx * h[..., 1, 1:2] - gy * h[..., 0, 1:2]
               + gz * h[..., 0, 2:3] - gx * h[..., 2, 2:3])
    F = gx * h[..., 1, 2:3] - gy * h[..., 0, 2:3]

    U = A * gz**2 - 2.0 * C * gx * gz + F * gx**2
    V = 2.0 * (B * gz**2 - C * gy * gz - E * gx * gz + F * gx * gy)
    W = D * gz**2 - 2.0 * E * gy * gz + F * gy**2

    s = jnp.sign(gz)
    disc = s * jnp.sqrt(jnp.abs(V**2 - 4.0 * U * W) + 1e-10)

    t1 = jnp.concatenate(
        [(-V + disc) * gz, 2.0 * U * gz, (V - disc) * gx - 2.0 * U * gy], axis=-1
    )
    t2 = jnp.concatenate(
        [(-V - disc) * gz, 2.0 * U * gz, (V + disc) * gx - 2.0 * U * gy], axis=-1
    )
    umbilical = (jnp.abs(U) + jnp.abs(V) + jnp.abs(W))[..., 0] < 1e-6
    return t1, t2, umbilical


def shape_operator_curvatures(normals_jac, normals, mode: str):
    """Curvatures from the Jacobian of a unit-normal field (render path).

    The sphere tracer shades with curvature computed from the *normalised*
    Hessian-normal field the way the reference does (``src/render_st.py:
    42-55``): mean = ½ tr(J), gaussian = −det of the bordered Jacobian.
    """
    if mode == "mean":
        return 0.5 * jnp.trace(normals_jac, axis1=-2, axis2=-1)
    if mode == "gaussian":
        batch = normals.shape[:-1]
        F = jnp.zeros(batch + (4, 4), dtype=normals.dtype)
        F = F.at[..., :3, :3].set(normals_jac)
        F = F.at[..., :3, 3].set(normals)
        F = F.at[..., 3, :3].set(normals)
        return -jnp.linalg.det(F)
    raise ValueError(f"unknown curvature mode {mode!r}")
