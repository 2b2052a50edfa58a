"""Pallas TPU kernel: fused SIREN value + gradient + Hessian forward.

The framework's hottest op (grid extraction, training forward, hit
attributes) as a single VMEM-resident kernel.  Key ideas:

  * The (a, J, H) Taylor-mode carries for a tile of T points are packed as
    one (10·T, h) row-stacked matrix [a; J₀;J₁;J₂; H₀…H₅], so each layer is
    ONE large MXU matmul (10T, h) @ (h, h) followed by VPU elementwise
    work — and the carries never leave VMEM between layers (the XLA
    version writes ~10 (N, h) tensors to HBM per layer).
  * Hidden weights are passed stacked as (L−1, h, h) and stay VMEM-resident
    across the whole grid; per-tile HBM traffic is just x in, (f, g, h6)
    out.
  * Outputs are packed into one (T, 16) tile (f | g | h6 | pad) to keep a
    lane-friendly last dimension.

Numerically identical to :func:`diffudf_tpu.autodiff.ops.
value_grad_hessian_packed` (f32 carries); see tests/test_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.siren import SirenSpec
from .sincos import sincos

# packed-Hessian component index pairs (must match autodiff.ops)
_TRI_I = (0, 0, 0, 1, 1, 2)
_TRI_J = (0, 1, 2, 1, 2, 2)


def _mm(a, b, compute_dtype):
    """MXU matmul with optional reduced-precision inputs (f32 accumulate).

    ``compute_dtype=jnp.bfloat16`` feeds the MXU its native input type —
    ~2-4x the f32 matmul throughput on v5e — while every elementwise op,
    accumulator and output stays f32.  Input rounding adds ~4e-3 relative
    noise to the J/H carries, the same magnitude as the (accepted) XLA
    ``deriv_dtype=bfloat16`` training path.
    """
    if compute_dtype is not None:
        a = a.astype(compute_dtype)
        b = b.astype(compute_dtype)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _vgh_kernel(x_ref, w1_ref, b1_ref, wh_ref, bh_ref, wl_ref, bl_ref, out_ref,
                *, spec: SirenSpec, tile: int, compute_dtype=None,
                fast_sincos: bool = True):
    h = spec.hidden[0]
    n_hidden_mm = len(spec.hidden) - 1  # layers applied to the stacked carry
    freqs = spec.freqs
    T = tile

    x = x_ref[:]  # (T, 3)

    # --- first layer: z = x @ W1 + b1 ----------------------------------------
    z = _mm(x, w1_ref[:], compute_dtype) + b1_ref[:]
    w0 = freqs[0]
    s, c = sincos(w0 * z, fast_sincos)
    d1 = w0 * c
    d2 = -(w0 * w0) * s

    a = s  # (T, h)
    # J carry after layer 1: J_k = d1 * W1[k, :]
    j0 = d1 * w1_ref[0, :][None, :]
    j1 = d1 * w1_ref[1, :][None, :]
    j2 = d1 * w1_ref[2, :][None, :]
    # H carry after layer 1: H_m = d2 * W1[i_m] * W1[j_m]
    hs = [
        d2 * (w1_ref[i, :] * w1_ref[j, :])[None, :]
        for i, j in zip(_TRI_I, _TRI_J)
    ]
    carry = jnp.concatenate([a, j0, j1, j2] + hs, axis=0)  # (10T, h)

    # --- hidden layers over the stacked carry (statically unrolled) ----------
    ww = freqs[1] if len(freqs) > 1 else freqs[0]

    for l in range(n_hidden_mm):
        w = wh_ref[l]  # (h, h) — static index, no dynamic VMEM slicing
        b = bh_ref[l]  # (h,)
        m = _mm(carry, w, compute_dtype)  # (10T, h)
        z = m[0:T] + b
        s, c = sincos(ww * z, fast_sincos)
        d1 = ww * c
        d2 = -(ww * ww) * s
        jz0, jz1, jz2 = m[T:2 * T], m[2 * T:3 * T], m[3 * T:4 * T]
        outer = [
            (jz0, jz0), (jz0, jz1), (jz0, jz2),
            (jz1, jz1), (jz1, jz2), (jz2, jz2),
        ]
        rows = [s, d1 * jz0, d1 * jz1, d1 * jz2]
        for k in range(6):
            hz = m[(4 + k) * T:(5 + k) * T]
            oa, ob = outer[k]
            rows.append(d1 * hz + d2 * (oa * ob))
        carry = jnp.concatenate(rows, axis=0)

    # --- output head ---------------------------------------------------------
    out = _mm(carry, wl_ref[:], compute_dtype)  # (10T, 1)
    cols = [out[0:T] + bl_ref[0]]
    cols += [out[(1 + k) * T:(2 + k) * T] for k in range(9)]
    cols.append(jnp.zeros((T, 6), jnp.float32))
    out_ref[:] = jnp.concatenate(cols, axis=1)  # (T, 16)


@partial(jax.jit, static_argnames=("spec", "tile", "compute_dtype",
                                   "fast_sincos"))
def vgh_pallas(params, spec: SirenSpec, x, tile: int = 256, compute_dtype=None,
               fast_sincos: bool = True):
    """Fused (f, ∇f, packed H) via the Pallas kernel.

    x: (N, 3) with N a multiple of ``tile``.  Returns (f (N,), g (N, 3),
    h6 (N, 6)) — same contract as ``value_grad_hessian_packed``.
    Requires a uniform hidden width (the flagship 8×256 shape).
    ``fast_sincos=False`` keeps the two exact transcendentals per layer
    (bit-comparable to the XLA path; default shares one range reduction —
    see ops/sincos.py).
    """
    h = spec.hidden[0]
    if any(w != h for w in spec.hidden):
        raise ValueError("pallas vgh kernel requires uniform hidden width")
    n = x.shape[0]
    if n % tile:
        raise ValueError(f"N={n} must be a multiple of tile={tile}")

    w1 = params[0]["w"]  # (3, h)
    b1 = params[0]["b"]
    wh = jnp.stack([p["w"] for p in params[1:-1]])  # (L-1, h, h)
    bh = jnp.stack([p["b"] for p in params[1:-1]])
    wl = params[-1]["w"]  # (h, 1)
    bl = params[-1]["b"]

    grid = (n // tile,)
    out = pl.pallas_call(
        partial(_vgh_kernel, spec=spec, tile=tile, compute_dtype=compute_dtype,
                fast_sincos=fast_sincos),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wh stacked
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bh stacked
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wl
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bl
        ],
        out_specs=pl.BlockSpec((tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 16), jnp.float32),
    )(x.astype(jnp.float32), w1, b1, wh, bh, wl, bl)
    return out[:, 0], out[:, 1:4], out[:, 4:10]
