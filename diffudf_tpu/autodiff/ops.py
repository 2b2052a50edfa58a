"""Fused value / gradient / Hessian evaluation of the SIREN field.

The reference computes ∇f with one reverse-mode pass and H(f) with three more
sequential reverse passes plus graph retention (``src/diff_operators.py:
187-212``).  On TPU we instead propagate (f, ∇f, H) *analytically forward*
through the MLP in a single fused pass — Taylor-mode differentiation
specialised to a chain of affine layers + pointwise activations.

Per layer with pre-activation z = a·W + b and activation σ(w·z):

    a'  = σ(w z)
    J'  = w σ'(w z) ⊙ (J·W)                       — Jacobian wrt input x ∈ R³
    H'ᵢⱼ = w σ'(w z) ⊙ (H·W)ᵢⱼ + w² σ''(w z) ⊙ (J·W)ᵢ (J·W)ⱼ

Everything is a large batched matmul: J is carried as (N, 3, h) and the
symmetric Hessian as its 6 upper-triangle components (N, 6, h), so the layer
cost is exactly 10 forward-sized matmuls — all MXU work, no graph transposes,
no sequential backward passes.  The whole computation is differentiable by
JAX reverse mode, so losses built on top of it get gradients for free.

Component order for the packed Hessian: (xx, xy, xz, yy, yz, zz).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.siren import SirenSpec, siren_apply

# upper-triangle index pairs, row-major: (0,0),(0,1),(0,2),(1,1),(1,2),(2,2)
_TRI_I = (0, 0, 0, 1, 1, 2)
_TRI_J = (0, 1, 2, 1, 2, 2)


def hess_from_packed(h6: jax.Array) -> jax.Array:
    """(..., 6) packed upper triangle -> (..., 3, 3) full symmetric matrix."""
    xx, xy, xz, yy, yz, zz = (h6[..., k] for k in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def pack_hess(h: jax.Array) -> jax.Array:
    """(..., 3, 3) symmetric matrix -> (..., 6) packed upper triangle."""
    return jnp.stack([h[..., i, j] for i, j in zip(_TRI_I, _TRI_J)], axis=-1)


def value(params, spec: SirenSpec, x: jax.Array, compute_dtype=None) -> jax.Array:
    """f(x): (N, 3) -> (N,).

    ``compute_dtype=jnp.bfloat16`` runs the *hidden* layers in bf16 (first
    layer stays f32 so input-coordinate precision survives the w0=30 phase
    amplification; accumulation is f32; output f32).  ~2× less activation
    traffic — the right mode for the sphere-trace inner loop where only the
    value is needed and the hit threshold is ~1e-3.
    """
    if compute_dtype is None:
        return siren_apply(params, spec, x)[..., 0]
    freqs = spec.freqs
    h = x
    for i, layer in enumerate(params[:-1]):
        if i == 0:
            z = h @ layer["w"] + layer["b"]
        else:
            z = jnp.dot(
                h, layer["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ) + layer["b"]
        if spec.activation == "sine":
            a = jnp.sin(freqs[i] * z)
        else:
            a = jax.nn.relu(freqs[i] * z)
        h = a.astype(compute_dtype)
    last = params[-1]
    return (
        jnp.dot(h, last["w"].astype(compute_dtype), preferred_element_type=jnp.float32)
        + last["b"]
    )[..., 0]


def _act(spec: SirenSpec, freq, z):
    """Returns (σ(wz), w·σ'(wz), w²·σ''(wz)) elementwise."""
    wz = freq * z
    if spec.activation == "sine":
        s = jnp.sin(wz)
        c = jnp.cos(wz)
        return s, freq * c, -(freq * freq) * s
    relu_mask = (wz > 0).astype(z.dtype)
    return wz * relu_mask, freq * relu_mask, jnp.zeros_like(z)


def _bmm(t: jax.Array, w: jax.Array) -> jax.Array:
    """(N, K, h_in) @ (h_in, h_out) as ONE flat (N·K, h_in) matmul.

    Critical on TPU: naive ``t @ w`` lowers to N batched (K, h) matmuls with
    K ∈ {3, 6} rows — ~2% MXU utilisation.  Flattening the derivative
    component axis into the row dimension makes it a single dense matmul.
    """
    n, k, h = t.shape
    return (t.reshape(n * k, h) @ w).reshape(n, k, -1)


def value_grad(params, spec: SirenSpec, x: jax.Array, deriv_dtype=None):
    """Fused (f, ∇f): (N, 3) -> ((N,), (N, 3)).  Cost ≈ 4 forward matmuls.

    ``deriv_dtype=jnp.bfloat16`` carries the Jacobian in bf16 (the value
    path stays f32): ~2× less HBM traffic on the bandwidth-bound TPU step
    at ~0.4% relative derivative error.  Outputs are always f32.
    """
    if spec.n_out != 1:
        raise ValueError("gradient ops require a scalar field (n_out == 1)")
    dd = x.dtype if deriv_dtype is None else deriv_dtype
    freqs = spec.freqs
    n = x.shape[0]
    a = x
    jac = jnp.broadcast_to(jnp.eye(3, dtype=dd), (n, 3, 3))
    for i, layer in enumerate(params[:-1]):
        w = layer["w"]
        z = a @ w + layer["b"]
        jz = _bmm(jac, w.astype(dd))  # (N, 3, h)
        a, d1, _ = _act(spec, freqs[i], z)
        jac = d1.astype(dd)[:, None, :] * jz
    last = params[-1]
    f = (a @ last["w"] + last["b"])[..., 0]
    g = _bmm(jac, last["w"].astype(dd))[..., 0].astype(x.dtype)
    return f, g


def value_grad_hessian(params, spec: SirenSpec, x: jax.Array, deriv_dtype=None):
    """Fused (f, ∇f, H): (N, 3) -> ((N,), (N, 3), (N, 3, 3)).

    One forward pass, ~10 forward-sized matmuls; replaces the reference's
    1 forward + 4 reverse passes (``src/evaluate.py:28-32``).
    """
    f, g, h6 = value_grad_hessian_packed(params, spec, x, deriv_dtype)
    return f, g, hess_from_packed(h6)


def value_grad_hessian_packed(params, spec: SirenSpec, x: jax.Array, deriv_dtype=None):
    """Like :func:`value_grad_hessian` but the Hessian stays packed as (N, 6).

    ``deriv_dtype``: dtype for the J/H carries (see :func:`value_grad`);
    the step is HBM-bandwidth-bound and the J/H tensors are ~90% of the
    traffic, so bf16 here buys ~1.8× on the training step.
    """
    if spec.n_out != 1:
        raise ValueError("gradient ops require a scalar field (n_out == 1)")
    dd = x.dtype if deriv_dtype is None else deriv_dtype
    freqs = spec.freqs
    n = x.shape[0]
    a = x
    jac = jnp.broadcast_to(jnp.eye(3, dtype=dd), (n, 3, 3))
    hes = jnp.zeros((n, 6, 3), dtype=dd)
    for i, layer in enumerate(params[:-1]):
        w = layer["w"]
        wd = w.astype(dd)
        z = a @ w + layer["b"]
        jz = _bmm(jac, wd)  # (N, 3, h)
        hz = _bmm(hes, wd)  # (N, 6, h)
        a, d1, d2 = _act(spec, freqs[i], z)
        # outer products (J·W)ᵢ (J·W)ⱼ for the 6 packed components — built
        # from static slices (a fancy-index gather here transposes to a
        # scatter in reverse mode, which is very slow on TPU)
        jx, jy, jzc = jz[:, 0, :], jz[:, 1, :], jz[:, 2, :]
        outer = jnp.stack(
            [jx * jx, jx * jy, jx * jzc, jy * jy, jy * jzc, jzc * jzc], axis=1
        )  # (N, 6, h)
        jac = d1.astype(dd)[:, None, :] * jz
        hes = d1.astype(dd)[:, None, :] * hz + d2.astype(dd)[:, None, :] * outer
    last = params[-1]
    f = (a @ last["w"] + last["b"])[..., 0]
    g = _bmm(jac, last["w"].astype(dd))[..., 0].astype(x.dtype)
    h6 = _bmm(hes, last["w"].astype(dd))[..., 0].astype(x.dtype)
    return f, g, h6


# --- reverse/forward-mode AD reference implementations (used in tests) -------


def value_grad_hessian_ad(params, spec: SirenSpec, x: jax.Array):
    """Same contract as :func:`value_grad_hessian`, via jacfwd∘grad.

    Kept as the independent oracle for unit tests; the hand-rolled
    propagation above is what hot paths use.
    """

    def f_scalar(pt):
        return siren_apply(params, spec, pt[None, :])[0, 0]

    f = siren_apply(params, spec, x)[..., 0]
    g = jax.vmap(jax.grad(f_scalar))(x)
    h = jax.vmap(jax.jacfwd(jax.grad(f_scalar)))(x)
    return f, g, h
