"""Pallas custom-VJP for the fused (f, ∇f, H) op — the training hot path.

The XLA reverse-mode backward of the Taylor-mode forward streams ~10 (N, h)
intermediate tensors per layer through HBM twice; the training step is
bandwidth-bound on exactly that traffic.  This module pairs the forward
kernel (ops/pallas_vgh.py) with a hand-derived backward kernel that

  * RECOMPUTES the forward carries tile-by-tile inside VMEM (residuals =
    just the inputs; zero intermediate HBM traffic),
  * propagates the cotangents layer-by-layer with the same row-stacked
    (10T, h) layout, so each direction of each layer is one MXU matmul,
  * accumulates weight gradients in VMEM across the whole grid (constant
    output blocks), writing each W̄ exactly once.

Backward math (per hidden layer, z = a·W + b, s = sin(wz), d1 = w·cos(wz),
d2 = −w²·s, Jz/Hz the post-matmul carries, O_m = Jz_{i_m}·Jz_{j_m}):

    z̄   = d1·ā + d2·(Σ_k J̄_k·Jz_k + Σ_m H̄_m·Hz_m) − w²·d1·Σ_m H̄_m·O_m
    J̄z_k = d1·J̄_k + d2·Σ_m H̄_m·∂O_m/∂Jz_k
    H̄z_m = d1·H̄_m
    W̄   += a_inᵀ·z̄ + Σ_k J_in,kᵀ·J̄z_k + Σ_m H_in,mᵀ·H̄z_m   (one stacked matmul)
    b̄   += Σ z̄ ;  carry-bar_in = [z̄; J̄z; H̄z] @ Wᵀ

Verified by finite-difference-free gradcheck against ``jax.grad`` of the
reference implementation (tests/test_pallas.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.siren import SirenSpec
from .pallas_vgh import _mm, _vgh_kernel, vgh_pallas
from .sincos import sincos

_TRI_I = (0, 0, 0, 1, 1, 2)
_TRI_J = (0, 1, 2, 1, 2, 2)


def _vgh_bwd_kernel(
    x_ref, w1_ref, b1_ref, wh_ref, bh_ref, wl_ref, cot_ref,
    wbar1_ref, bbar1_ref, wbarh_ref, bbarh_ref, wbarl_ref, bblL_ref,
    carr, d1s, d2s,
    *, spec: SirenSpec, tile: int, compute_dtype=None,
    fast_sincos: bool = True,
):
    h = spec.hidden[0]
    L = len(spec.hidden)  # total activation layers
    n_hidden_mm = L - 1
    freqs = spec.freqs
    w0 = freqs[0]
    ww = freqs[1] if len(freqs) > 1 else freqs[0]
    T = tile

    # ---- zero the accumulators on the first grid step ------------------------
    @pl.when(pl.program_id(0) == 0)
    def _():
        wbar1_ref[:] = jnp.zeros_like(wbar1_ref)
        bbar1_ref[:] = jnp.zeros_like(bbar1_ref)
        wbarh_ref[:] = jnp.zeros_like(wbarh_ref)
        bbarh_ref[:] = jnp.zeros_like(bbarh_ref)
        wbarl_ref[:] = jnp.zeros_like(wbarl_ref)
        bblL_ref[:] = jnp.zeros_like(bblL_ref)

    x = x_ref[:]  # (T, 3)

    # ---- forward recompute, carries + activation derivs into scratch ---------
    z = _mm(x, w1_ref[:], compute_dtype) + b1_ref[:]
    s, c = sincos(w0 * z, fast_sincos)
    d1 = w0 * c
    d2 = -(w0 * w0) * s
    d1s[0] = d1
    d2s[0] = d2
    j_rows = [d1 * w1_ref[k, :][None, :] for k in range(3)]
    h_rows = [
        d2 * (w1_ref[i, :] * w1_ref[j, :])[None, :]
        for i, j in zip(_TRI_I, _TRI_J)
    ]
    carry = jnp.concatenate([s] + j_rows + h_rows, axis=0)  # (10T, h)
    carr[0] = carry

    for l in range(n_hidden_mm):
        m = _mm(carry, wh_ref[l], compute_dtype)
        z = m[0:T] + bh_ref[l]
        s, c = sincos(ww * z, fast_sincos)
        d1 = ww * c
        d2 = -(ww * ww) * s
        d1s[l + 1] = d1
        d2s[l + 1] = d2
        jz = [m[(1 + k) * T:(2 + k) * T] for k in range(3)]
        rows = [s] + [d1 * jz[k] for k in range(3)]
        for q in range(6):
            hz = m[(4 + q) * T:(5 + q) * T]
            rows.append(d1 * hz + d2 * (jz[_TRI_I[q]] * jz[_TRI_J[q]]))
        carry = jnp.concatenate(rows, axis=0)
        carr[l + 1] = carry  # input to next layer / head

    # ---- head backward -------------------------------------------------------
    cot = cot_ref[:]  # (T, 16): f̄ | ḡ(3) | h̄6(6) | pad
    wl_row = wl_ref[:, 0][None, :]  # (1, h)
    head_in = carr[n_hidden_mm]  # (10T, h)

    cb_rows = [cot[:, k:k + 1] * wl_row for k in range(10)]
    carrybar = jnp.concatenate(cb_rows, axis=0)  # (10T, h)

    # W̄L (stored transposed, (1, h)) = Σ_k cot[:,k]ᵀ · head_in-group-k
    wlbar = _mm(cot[:, 0:1].T, head_in[0:T], compute_dtype)
    for k in range(1, 10):
        wlbar = wlbar + _mm(
            cot[:, k:k + 1].T, head_in[k * T:(k + 1) * T], compute_dtype
        )
    wbarl_ref[:] += wlbar
    # sum of f̄ without a lane-offset 1-D slice (Mosaic limitation)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, cot.shape, 1)
    fbar_sum = jnp.sum(jnp.where(col_ids == 0, cot, 0.0))
    bblL_ref[:] += fbar_sum[None, None]

    # ---- hidden layers backward ---------------------------------------------
    for l in reversed(range(n_hidden_mm)):
        carry_in = carr[l]
        m = _mm(carry_in, wh_ref[l], compute_dtype)
        d1 = d1s[l + 1]
        d2 = d2s[l + 1]
        jz = [m[(1 + k) * T:(2 + k) * T] for k in range(3)]
        hz = [m[(4 + q) * T:(5 + q) * T] for q in range(6)]

        ab = carrybar[0:T]
        jb = [carrybar[(1 + k) * T:(2 + k) * T] for k in range(3)]
        hb = [carrybar[(4 + q) * T:(5 + q) * T] for q in range(6)]

        sum_j = jb[0] * jz[0] + jb[1] * jz[1] + jb[2] * jz[2]
        sum_h = sum(hb[q] * hz[q] for q in range(6))
        sum_o = sum(hb[q] * (jz[_TRI_I[q]] * jz[_TRI_J[q]]) for q in range(6))
        zbar = d1 * ab + d2 * (sum_j + sum_h) - (ww * ww) * d1 * sum_o

        jzbar = [
            d1 * jb[0] + d2 * (2 * hb[0] * jz[0] + hb[1] * jz[1] + hb[2] * jz[2]),
            d1 * jb[1] + d2 * (hb[1] * jz[0] + 2 * hb[3] * jz[1] + hb[4] * jz[2]),
            d1 * jb[2] + d2 * (hb[2] * jz[0] + hb[4] * jz[1] + 2 * hb[5] * jz[2]),
        ]
        hzbar = [d1 * hb[q] for q in range(6)]

        mbar = jnp.concatenate([zbar] + jzbar + hzbar, axis=0)  # (10T, h)
        wbarh_ref[l] += _mm(carry_in.T, mbar, compute_dtype)
        bbarh_ref[l, :] += jnp.sum(zbar, axis=0)
        carrybar = _mm(mbar, wh_ref[l].T, compute_dtype)

    # ---- first layer backward ------------------------------------------------
    d1 = d1s[0]
    d2 = d2s[0]
    ab = carrybar[0:T]
    jb = [carrybar[(1 + k) * T:(2 + k) * T] for k in range(3)]
    hb = [carrybar[(4 + q) * T:(5 + q) * T] for q in range(6)]
    w1 = w1_ref[:]  # (3, h)

    sum_jw = sum(jb[k] * w1[k, :][None, :] for k in range(3))
    sum_hw = sum(
        hb[q] * (w1[_TRI_I[q], :] * w1[_TRI_J[q], :])[None, :] for q in range(6)
    )
    zbar1 = d1 * ab + d2 * sum_jw - (w0 * w0) * d1 * sum_hw

    wbar1 = _mm(x.T, zbar1, compute_dtype)  # (3, h)
    # direct dependence of J₁/H₁ on W1 rows
    direct = []
    for k in range(3):
        row = jnp.sum(jb[k] * d1, axis=0)
        for q in range(6):
            if _TRI_I[q] == k:
                row = row + jnp.sum(hb[q] * d2, axis=0) * w1[_TRI_J[q], :]
            if _TRI_J[q] == k:
                row = row + jnp.sum(hb[q] * d2, axis=0) * w1[_TRI_I[q], :]
        direct.append(row)
    wbar1_ref[:] += wbar1 + jnp.stack(direct, axis=0)
    bbar1_ref[0, :] += jnp.sum(zbar1, axis=0)


@partial(jax.jit, static_argnames=("spec", "tile", "compute_dtype",
                                   "fast_sincos"))
def _vgh_bwd(params, spec: SirenSpec, x, cot_packed, tile: int = 64,
             compute_dtype=None, fast_sincos: bool = True):
    """-> param cotangents (same pytree structure as params)."""
    h = spec.hidden[0]
    L = len(spec.hidden)
    n = x.shape[0]
    n_hidden_mm = L - 1

    w1 = params[0]["w"]
    b1 = params[0]["b"]
    wh = jnp.stack([p["w"] for p in params[1:-1]])
    bh = jnp.stack([p["b"] for p in params[1:-1]])
    wl = params[-1]["w"]

    grid = (n // tile,)
    outs = pl.pallas_call(
        partial(_vgh_bwd_kernel, spec=spec, tile=tile,
                compute_dtype=compute_dtype, fast_sincos=fast_sincos),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wl
            pl.BlockSpec((tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_hidden_mm, h, h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_hidden_mm, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((n_hidden_mm, h, h), jnp.float32),
            jax.ShapeDtypeStruct((n_hidden_mm, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, 10 * tile, h), jnp.float32),  # carries
            pltpu.VMEM((L, tile, h), jnp.float32),  # d1 per layer
            pltpu.VMEM((L, tile, h), jnp.float32),  # d2 per layer
        ],
    )(x.astype(jnp.float32), w1, b1, wh, bh, wl, cot_packed)

    wbar1, bbar1, wbarh, bbarh, wbarl_t, bbarl = outs
    grads = [{"w": wbar1, "b": bbar1[0]}]
    for l in range(n_hidden_mm):
        grads.append({"w": wbarh[l], "b": bbarh[l]})
    grads.append({"w": wbarl_t.T, "b": bbarl[0]})
    return grads


@lru_cache(maxsize=8)
def make_vgh_op(spec: SirenSpec, fwd_tile: int = 256, bwd_tile: int = 64,
                compute_dtype=None, fast_sincos: bool = True):
    """Custom-VJP fused (f, ∇f, h6) op specialised to an architecture.

    Returns ``op(params, x) -> (f, g, h6)``, differentiable wrt params
    (x is treated as non-differentiable data, which is what training needs).
    ``compute_dtype=jnp.bfloat16`` runs every MXU matmul (forward recompute
    and cotangent propagation) on bf16 inputs with f32 accumulation — the
    kernel-level analogue of the XLA path's ``deriv_dtype``.
    ``fast_sincos`` (default on) shares one range reduction per layer
    between sin and cos in both the forward and the backward recompute
    (ops/sincos.py, ≤6.3e-7 abs activation error); the backward uses the
    SAME activation function as the forward, so the VJP stays exactly
    consistent with the op it differentiates.
    """
    h = spec.hidden[0]
    if any(w != h for w in spec.hidden) or spec.activation != "sine":
        raise ValueError("custom vgh op requires a uniform-width sine net")

    @jax.custom_vjp
    def op(params, x):
        return vgh_pallas(params, spec, x, tile=fwd_tile,
                          compute_dtype=compute_dtype,
                          fast_sincos=fast_sincos)

    def fwd(params, x):
        return op(params, x), (params, x)

    def bwd(res, cots):
        params, x = res
        fbar, gbar, hbar = cots
        cot_packed = jnp.concatenate(
            [fbar[:, None], gbar, hbar, jnp.zeros((x.shape[0], 6), jnp.float32)],
            axis=1,
        )
        grads = _vgh_bwd(params, spec, x, cot_packed, tile=bwd_tile,
                         compute_dtype=compute_dtype,
                         fast_sincos=fast_sincos)
        return grads, None

    op.defvjp(fwd, bwd)
    return op
