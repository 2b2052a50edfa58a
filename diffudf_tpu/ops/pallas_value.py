"""Pallas TPU kernel: plain SIREN value forward (sphere-trace inner loop).

The march evaluates f on the full ray set every iteration; the XLA forward
streams each layer's activations through HBM (~8 GB per 520k-ray iteration).
This kernel keeps the (T, h) activation resident in VMEM across all layers —
per-tile HBM traffic is x in, f out, weights once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.siren import SirenSpec
from . import sincos as _sc


def _value_kernel(x_ref, w1_ref, b1_ref, wh_ref, bh_ref, wl_ref, bl_ref,
                  out_ref, *, spec: SirenSpec, tile: int, mixed: bool,
                  fast_sincos: bool = True):
    freqs = spec.freqs
    w0 = freqs[0]
    ww = freqs[1] if len(freqs) > 1 else freqs[0]
    # first layer always f32: input-coordinate precision must survive the
    # w0=30 phase amplification (mirrors autodiff.ops.value's bf16 mode)
    a = _sc.sin(
        w0 * (jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
              + b1_ref[:]),
        fast_sincos,
    )
    dt = jnp.bfloat16 if mixed else jnp.float32
    for l in range(len(spec.hidden) - 1):
        # bf16 operands (weights pre-cast by the caller), f32 accumulation
        # and f32 sin — the MXU runs bf16 matmuls in one pass instead of
        # f32's three, which is the sphere-trace inner loop's entire cost
        a = _sc.sin(
            ww * (jnp.dot(a.astype(dt), wh_ref[l],
                          preferred_element_type=jnp.float32)
                  + bh_ref[l]),
            fast_sincos,
        )
    f = jnp.dot(a.astype(dt), wl_ref[:],
                preferred_element_type=jnp.float32) + bl_ref[0]
    out_ref[:] = jnp.broadcast_to(f, out_ref.shape)


@partial(jax.jit, static_argnames=("spec", "tile", "compute_dtype",
                                   "fast_sincos"))
def value_pallas(params, spec: SirenSpec, x, tile: int = 1024,
                 compute_dtype=None, fast_sincos: bool = True):
    """f(x): (N, 3) -> (N,), N % tile == 0, uniform-width sine net.

    ``compute_dtype=jnp.bfloat16`` mirrors ``autodiff.ops.value``'s mixed
    mode: f32 first layer / accumulation / sin, bf16 hidden-matmul operands
    (~|f| error ≲1e-3 relative — inside the march's hit tolerance).
    """
    h = spec.hidden[0]
    if any(w != h for w in spec.hidden) or spec.activation != "sine":
        raise ValueError("pallas value kernel requires a uniform-width sine net")
    n = x.shape[0]
    if n % tile:
        raise ValueError(f"N={n} must be a multiple of tile={tile}")
    mixed = compute_dtype is not None and jnp.dtype(compute_dtype) == jnp.bfloat16
    wdt = jnp.bfloat16 if mixed else jnp.float32
    w1 = params[0]["w"]
    b1 = params[0]["b"]
    wh = jnp.stack([p["w"] for p in params[1:-1]]).astype(wdt)
    bh = jnp.stack([p["b"] for p in params[1:-1]])
    wl = params[-1]["w"].astype(wdt)
    bl = params[-1]["b"]
    out = pl.pallas_call(
        partial(_value_kernel, spec=spec, tile=tile, mixed=mixed,
                fast_sincos=fast_sincos),
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
    return out[:, 0]
