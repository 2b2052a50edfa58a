"""Pallas custom-VJP for fused value + gradient (no Hessian).

The off-surface two-thirds of every stage-1 batch (and the whole batch in
siren mode) only needs (f, ∇f); this is the 4-row-stack sibling of the
(f, ∇f, H) kernels in pallas_vgh*.py — carry = [a; J₀; J₁; J₂], one
(4T, h) MXU matmul per layer, VMEM-resident, hand-derived backward with
carry recompute.  Same conventions and validation strategy
(tests/test_pallas.py gradchecks vs jax.grad of the reference).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.siren import SirenSpec
from .pallas_vgh import _mm
from .sincos import sincos


def _vg_fwd_kernel(x_ref, w1_ref, b1_ref, wh_ref, bh_ref, wl_ref, bl_ref,
                   out_ref, *, spec: SirenSpec, tile: int, compute_dtype=None,
                   fast_sincos: bool = True):
    n_hidden_mm = len(spec.hidden) - 1
    freqs = spec.freqs
    w0 = freqs[0]
    ww = freqs[1] if len(freqs) > 1 else freqs[0]
    T = tile

    x = x_ref[:]
    z = _mm(x, w1_ref[:], compute_dtype) + b1_ref[:]
    s, c = sincos(w0 * z, fast_sincos)
    d1 = w0 * c
    rows = [s] + [d1 * w1_ref[k, :][None, :] for k in range(3)]
    carry = jnp.concatenate(rows, axis=0)  # (4T, h)

    for l in range(n_hidden_mm):
        m = _mm(carry, wh_ref[l], compute_dtype)
        z = m[0:T] + bh_ref[l]
        s, c = sincos(ww * z, fast_sincos)
        d1 = ww * c
        carry = jnp.concatenate(
            [s] + [d1 * m[(1 + k) * T:(2 + k) * T] for k in range(3)], axis=0
        )

    out = _mm(carry, wl_ref[:], compute_dtype)  # (4T,1)
    cols = [out[0:T] + bl_ref[0]]
    cols += [out[(1 + k) * T:(2 + k) * T] for k in range(3)]
    cols.append(jnp.zeros((T, 4), jnp.float32))
    out_ref[:] = jnp.concatenate(cols, axis=1)  # (T, 8)


@partial(jax.jit, static_argnames=("spec", "tile", "compute_dtype",
                                   "fast_sincos"))
def vg_pallas(params, spec: SirenSpec, x, tile: int = 256, compute_dtype=None,
              fast_sincos: bool = True):
    """Fused (f, ∇f): x (N, 3), N % tile == 0 -> (f (N,), g (N, 3))."""
    h = spec.hidden[0]
    if any(w != h for w in spec.hidden):
        raise ValueError("pallas vg kernel requires uniform hidden width")
    n = x.shape[0]
    if n % tile:
        raise ValueError(f"N={n} must be a multiple of tile={tile}")
    w1 = params[0]["w"]
    b1 = params[0]["b"]
    wh = jnp.stack([p["w"] for p in params[1:-1]])
    bh = jnp.stack([p["b"] for p in params[1:-1]])
    wl = params[-1]["w"]
    bl = params[-1]["b"]
    out = pl.pallas_call(
        partial(_vg_fwd_kernel, spec=spec, tile=tile,
                compute_dtype=compute_dtype, fast_sincos=fast_sincos),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
    )(x.astype(jnp.float32), w1, b1, wh, bh, wl, bl)
    return out[:, 0], out[:, 1:4]


def _vg_bwd_kernel(
    x_ref, w1_ref, b1_ref, wh_ref, bh_ref, wl_ref, cot_ref,
    wbar1_ref, bbar1_ref, wbarh_ref, bbarh_ref, wbarl_ref, bblL_ref,
    carr, d1s, d2s,
    *, spec: SirenSpec, tile: int, compute_dtype=None,
    fast_sincos: bool = True,
):
    L = len(spec.hidden)
    n_hidden_mm = L - 1
    freqs = spec.freqs
    w0 = freqs[0]
    ww = freqs[1] if len(freqs) > 1 else freqs[0]
    T = tile

    @pl.when(pl.program_id(0) == 0)
    def _():
        wbar1_ref[:] = jnp.zeros_like(wbar1_ref)
        bbar1_ref[:] = jnp.zeros_like(bbar1_ref)
        wbarh_ref[:] = jnp.zeros_like(wbarh_ref)
        bbarh_ref[:] = jnp.zeros_like(bbarh_ref)
        wbarl_ref[:] = jnp.zeros_like(wbarl_ref)
        bblL_ref[:] = jnp.zeros_like(bblL_ref)

    x = x_ref[:]

    # forward recompute
    z = _mm(x, w1_ref[:], compute_dtype) + b1_ref[:]
    s, c = sincos(w0 * z, fast_sincos)
    d1 = w0 * c
    d1s[0] = d1
    d2s[0] = -(w0 * w0) * s
    carry = jnp.concatenate(
        [s] + [d1 * w1_ref[k, :][None, :] for k in range(3)], axis=0
    )
    carr[0] = carry
    for l in range(n_hidden_mm):
        m = _mm(carry, wh_ref[l], compute_dtype)
        z = m[0:T] + bh_ref[l]
        s, c = sincos(ww * z, fast_sincos)
        d1 = ww * c
        d1s[l + 1] = d1
        d2s[l + 1] = -(ww * ww) * s
        carry = jnp.concatenate(
            [s] + [d1 * m[(1 + k) * T:(2 + k) * T] for k in range(3)], axis=0
        )
        carr[l + 1] = carry

    # head backward
    cot = cot_ref[:]  # (T, 8): f̄ | ḡ(3) | pad
    wl_row = wl_ref[:, 0][None, :]
    head_in = carr[n_hidden_mm]
    carrybar = jnp.concatenate(
        [cot[:, k:k + 1] * wl_row for k in range(4)], axis=0
    )
    wlbar = _mm(cot[:, 0:1].T, head_in[0:T], compute_dtype)
    for k in range(1, 4):
        wlbar = wlbar + _mm(
            cot[:, k:k + 1].T, head_in[k * T:(k + 1) * T], compute_dtype
        )
    wbarl_ref[:] += wlbar
    col_ids = jax.lax.broadcasted_iota(jnp.int32, cot.shape, 1)
    bblL_ref[:] += jnp.sum(jnp.where(col_ids == 0, cot, 0.0))[None, None]

    # hidden layers backward
    for l in reversed(range(n_hidden_mm)):
        carry_in = carr[l]
        m = _mm(carry_in, wh_ref[l], compute_dtype)
        d1 = d1s[l + 1]
        d2 = d2s[l + 1]
        jz = [m[(1 + k) * T:(2 + k) * T] for k in range(3)]
        ab = carrybar[0:T]
        jb = [carrybar[(1 + k) * T:(2 + k) * T] for k in range(3)]
        zbar = d1 * ab + d2 * (jb[0] * jz[0] + jb[1] * jz[1] + jb[2] * jz[2])
        jzbar = [d1 * jb[k] for k in range(3)]
        mbar = jnp.concatenate([zbar] + jzbar, axis=0)
        wbarh_ref[l] += _mm(carry_in.T, mbar, compute_dtype)
        bbarh_ref[l, :] += jnp.sum(zbar, axis=0)
        carrybar = _mm(mbar, wh_ref[l].T, compute_dtype)

    # first layer backward
    d1 = d1s[0]
    d2 = d2s[0]
    ab = carrybar[0:T]
    jb = [carrybar[(1 + k) * T:(2 + k) * T] for k in range(3)]
    w1 = w1_ref[:]
    zbar1 = d1 * ab + d2 * sum(jb[k] * w1[k, :][None, :] for k in range(3))
    wbar1 = _mm(x.T, zbar1, compute_dtype)
    direct = [jnp.sum(jb[k] * d1, axis=0) for k in range(3)]
    wbar1_ref[:] += wbar1 + jnp.stack(direct, axis=0)
    bbar1_ref[0, :] += jnp.sum(zbar1, axis=0)


@partial(jax.jit, static_argnames=("spec", "tile", "compute_dtype",
                                   "fast_sincos"))
def _vg_bwd(params, spec: SirenSpec, x, cot_packed, tile: int = 128,
            compute_dtype=None, fast_sincos: bool = True):
    h = spec.hidden[0]
    L = len(spec.hidden)
    n = x.shape[0]
    n_hidden_mm = L - 1
    w1 = params[0]["w"]
    b1 = params[0]["b"]
    wh = jnp.stack([p["w"] for p in params[1:-1]])
    bh = jnp.stack([p["b"] for p in params[1:-1]])
    wl = params[-1]["w"]
    outs = pl.pallas_call(
        partial(_vg_bwd_kernel, spec=spec, tile=tile,
                compute_dtype=compute_dtype, fast_sincos=fast_sincos),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((L, 4 * tile, h), jnp.float32),
            pltpu.VMEM((L, tile, h), jnp.float32),
            pltpu.VMEM((L, tile, h), jnp.float32),
        ],
    )(x.astype(jnp.float32), w1, b1, wh, bh, wl, cot_packed)
    wbar1, bbar1, wbarh, bbarh, wbarl_t, bbarl = outs
    grads = [{"w": wbar1, "b": bbar1[0]}]
    for l in range(n_hidden_mm):
        grads.append({"w": wbarh[l], "b": bbarh[l]})
    grads.append({"w": wbarl_t.T, "b": bbarl[0]})
    return grads


@lru_cache(maxsize=8)
def make_vg_op(spec: SirenSpec, fwd_tile: int = 256, bwd_tile: int = 128,
               compute_dtype=None, fast_sincos: bool = True):
    """Custom-VJP fused (f, ∇f) op, differentiable wrt params (x non-diff).

    ``compute_dtype=jnp.bfloat16`` feeds the MXU bf16 inputs (f32
    accumulate) in every matmul — see ``pallas_vgh._mm``.  ``fast_sincos``
    (default on) shares one range reduction between sin and cos per layer
    in forward and backward recompute alike (ops/sincos.py)."""
    h = spec.hidden[0]
    if any(w != h for w in spec.hidden) or spec.activation != "sine":
        raise ValueError("custom vg op requires a uniform-width sine net")

    @jax.custom_vjp
    def op(params, x):
        return vg_pallas(params, spec, x, tile=fwd_tile,
                         compute_dtype=compute_dtype,
                         fast_sincos=fast_sincos)

    def fwd(params, x):
        return op(params, x), (params, x)

    def bwd(res, cots):
        params, x = res
        fbar, gbar = cots
        cot_packed = jnp.concatenate(
            [fbar[:, None], gbar, jnp.zeros((x.shape[0], 4), jnp.float32)], axis=1
        )
        return _vg_bwd(params, spec, x, cot_packed, tile=bwd_tile,
                       compute_dtype=compute_dtype,
                       fast_sincos=fast_sincos), None

    op.defvjp(fwd, bwd)
    return op
