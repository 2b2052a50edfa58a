"""Closed-form eigendecomposition of batched symmetric 3×3 matrices.

The reference calls ``torch.linalg.eigh`` on tens of thousands (training) to
millions (grid extraction) of tiny 3×3 Hessians — a batched LAPACK kernel that
has no efficient TPU mapping.  Here we use the trigonometric solution of the
characteristic cubic (Smith's algorithm) plus a Cayley–Hamilton eigenvector
construction: pure elementwise VPU arithmetic, fully vectorised over any batch
shape, differentiable, and jit/shard_map friendly.

Conventions mirror ``numpy.linalg.eigh``: eigenvalues ascending, eigenvector k
is the *column* ``v[..., :, k]`` — so ``v[..., 2]`` is the eigenvector of the
largest eigenvalue, the "Hessian normal" used throughout the framework
(reference ``src/loss_functions.py:141-143``, ``src/render_mc.py:77-84``).
Eigenvector signs are arbitrary, as with any eigh.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-30


def _eigvals3(A):
    """Eigenvalues of symmetric (..., 3, 3), ascending: (..., 3)."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = a01**2 + a02**2 + a12**2
    d0, d1, d2 = A[..., 0, 0] - q, A[..., 1, 1] - q, A[..., 2, 2] - q
    p2 = d0**2 + d1**2 + d2**2 + 2.0 * p1
    # gradient-safe: sqrt'(0) and arccos'(±1) are infinite, and this op sits
    # inside the training loss (reverse-mode flows through it); the 1e-12 /
    # 1e-7 pads bias eigenvalues by ≲1e-6 — far below field accuracy
    p = jnp.sqrt((jnp.maximum(p2, 0.0) + 1e-12) / 6.0)
    safe_p = jnp.maximum(p, _EPS)
    B = (A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)) / safe_p[..., None, None]
    # r = det(B) / 2, clipped strictly inside the acos domain
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    r = jnp.clip(detB / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    phi = jnp.arccos(r) / 3.0
    lam_hi = q + 2.0 * p * jnp.cos(phi)
    lam_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_hi - lam_lo
    return jnp.stack([lam_lo, lam_mid, lam_hi], axis=-1)


def _eigvec_for(A, lam_a, lam_b):
    """Eigenvector for the remaining eigenvalue via Cayley–Hamilton.

    For symmetric A with eigenvalues (λ, λa, λb), the matrix
    M = (A - λa I)(A - λb I) maps everything into the λ-eigenspace, so any
    non-null column of M is a λ-eigenvector.  We take the largest-norm column
    for conditioning; a degenerate (repeated-eigenvalue) M of all-zero columns
    falls back to ẑ, which is the right "any vector of the eigenspace works"
    behaviour for isotropic Hessians.
    """
    eye = jnp.eye(3, dtype=A.dtype)
    Ma = A - lam_a[..., None, None] * eye
    Mb = A - lam_b[..., None, None] * eye
    # 3×3 product via broadcast-multiply + sum: batched tiny dot_generals
    # pad to full MXU tiles on TPU (catastrophic); this stays on the VPU
    M = jnp.sum(Ma[..., :, :, None] * Mb[..., None, :, :], axis=-2)
    norms = jnp.sum(M * M, axis=-2)  # (..., 3) column squared norms
    # column selection via where-chains, not take_along_axis: the gather's
    # reverse-mode transpose is a scatter — pathological on TPU
    n0, n1, n2 = norms[..., 0], norms[..., 1], norms[..., 2]
    c0, c1, c2 = M[..., :, 0], M[..., :, 1], M[..., :, 2]
    use0 = ((n0 >= n1) & (n0 >= n2))[..., None]
    use1 = (n1 >= n2)[..., None]
    v = jnp.where(use0, c0, jnp.where(use1, c1, c2))
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype=A.dtype), v.shape)
    # double-where: degenerate columns are replaced BEFORE the division so
    # reverse-mode never sees a 0/0 (where() alone still backprops NaN
    # through the untaken branch)
    vn2 = jnp.sum(v * v, axis=-1, keepdims=True)
    ok = vn2 > 1e-20
    v_safe = jnp.where(ok, v, fallback)
    vnorm = jnp.sqrt(jnp.sum(v_safe * v_safe, axis=-1, keepdims=True))
    return v_safe / jnp.maximum(vnorm, _EPS)


def eigh3x3(A):
    """Batched eigh for symmetric (..., 3, 3).

    Returns ``(eigvals (..., 3) ascending, eigvecs (..., 3, 3))`` with
    eigenvector k in column ``[..., :, k]`` (numpy.linalg.eigh layout).
    """
    lam = _eigvals3(A)
    l0, l1, l2 = lam[..., 0], lam[..., 1], lam[..., 2]
    v2 = _eigvec_for(A, l0, l1)  # largest
    v0 = _eigvec_for(A, l1, l2)  # smallest
    # middle eigenvector: orthogonal complement — cheaper and better
    # conditioned than the Cayley–Hamilton column when λ1 sits near λ0 or λ2
    v1 = jnp.cross(v2, v0)
    n1 = jnp.linalg.norm(v1, axis=-1, keepdims=True)
    v1 = jnp.where(n1 > 1e-20, v1 / jnp.maximum(n1, _EPS), _eigvec_for(A, l0, l2))
    return lam, jnp.stack([v0, v1, v2], axis=-1)


def top_eigenvector(A):
    """Unit eigenvector of the largest eigenvalue: (..., 3, 3) -> (..., 3).

    The cheap path for Hessian-normal extraction — skips the other two
    eigenvectors entirely.
    """
    lam = _eigvals3(A)
    return _eigvec_for(A, lam[..., 0], lam[..., 1])


def top_eigenvector_packed(h6):
    """Top eigenvector straight from a packed (..., 6) Hessian."""
    from .ops import hess_from_packed

    return top_eigenvector(hess_from_packed(h6))
