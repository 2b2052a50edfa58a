#!/usr/bin/env python
"""Experiment: software-pipeline the vgh forward kernel's VPU work
(sin/cos + carry assembly) against the MXU matmuls.

BENCH_mfu.json shows the fused kernels at 66-78 TFLOP/s vs a 120 TFLOP/s
default-precision matmul ceiling — VPU-bound.  MXU and VPU can execute
concurrently; a single dependence chain (matmul → sin → matmul …) cannot
overlap them, but two independent half-tile streams interleaved can:

    mA = mm(cA, w[l])        # MXU stream A
    mB = mm(cB, w[l])        # MXU stream B (independent of vpu(mA))
    cA = vpu(mA)             # VPU overlaps mB's MXU time
    mA = mm(cA, w[l+1])
    cB = vpu(mB)             # VPU overlaps mA's MXU time

Measures baseline vs pipelined forward at equal total tile sizes.

    python scripts/exp_pipeline_vgh.py
"""

from __future__ import annotations

import json
import os.path as osp
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from diffudf_tpu.fields.siren import SirenSpec, init_siren  # noqa: E402
from diffudf_tpu.ops.pallas_vgh import _TRI_I, _TRI_J, _mm, vgh_pallas  # noqa: E402

H = 256
MF_VGH_FWD = 2 * 10 * H * H * 7 / 1e6


def _first_layer(x, w1, b1, w0, compute_dtype):
    z = _mm(x, w1, compute_dtype) + b1
    s = jnp.sin(w0 * z)
    d1 = w0 * jnp.cos(w0 * z)
    d2 = -(w0 * w0) * s
    j_rows = [d1 * w1[k, :][None, :] for k in range(3)]
    h_rows = [d2 * (w1[i, :] * w1[j, :])[None, :]
              for i, j in zip(_TRI_I, _TRI_J)]
    return jnp.concatenate([s] + j_rows + h_rows, axis=0)


def _vpu_stage(m, b, ww, T):
    z = m[0:T] + b
    s = jnp.sin(ww * z)
    d1 = ww * jnp.cos(ww * z)
    d2 = -(ww * ww) * s
    jz = [m[(1 + k) * T:(2 + k) * T] for k in range(3)]
    rows = [s] + [d1 * jz[k] for k in range(3)]
    outer = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    for q in range(6):
        hz = m[(4 + q) * T:(5 + q) * T]
        a, bb = outer[q]
        rows.append(d1 * hz + d2 * (jz[a] * jz[bb]))
    return jnp.concatenate(rows, axis=0)


def _head(carry, wl, bl, T, compute_dtype):
    out = _mm(carry, wl, compute_dtype)
    cols = [out[0:T] + bl[0]]
    cols += [out[(1 + k) * T:(2 + k) * T] for k in range(9)]
    cols.append(jnp.zeros((T, 6), jnp.float32))
    return jnp.concatenate(cols, axis=1)


def _vgh_kernel_pipe(x_ref, w1_ref, b1_ref, wh_ref, bh_ref, wl_ref, bl_ref,
                     out_ref, *, spec, tile, compute_dtype=None):
    L = len(spec.hidden) - 1
    freqs = spec.freqs
    w0 = freqs[0]
    ww = freqs[1] if len(freqs) > 1 else freqs[0]
    Th = tile // 2

    x = x_ref[:]
    cA = _first_layer(x[:Th], w1_ref[:], b1_ref[:], w0, compute_dtype)
    cB = _first_layer(x[Th:], w1_ref[:], b1_ref[:], w0, compute_dtype)

    mA = _mm(cA, wh_ref[0], compute_dtype)
    for l in range(L):
        mB = _mm(cB, wh_ref[l], compute_dtype)
        cA = _vpu_stage(mA, bh_ref[l], ww, Th)
        if l + 1 < L:
            mA = _mm(cA, wh_ref[l + 1], compute_dtype)
        cB = _vpu_stage(mB, bh_ref[l], ww, Th)

    outA = _head(cA, wl_ref[:], bl_ref[:], Th, compute_dtype)
    outB = _head(cB, wl_ref[:], bl_ref[:], Th, compute_dtype)
    out_ref[:] = jnp.concatenate([outA, outB], axis=0)


@partial(jax.jit, static_argnames=("spec", "tile", "compute_dtype"))
def vgh_pipe(params, spec, x, tile=256, compute_dtype=None):
    h = spec.hidden[0]
    n = x.shape[0]
    w1 = params[0]["w"]
    b1 = params[0]["b"]
    wh = jnp.stack([p["w"] for p in params[1:-1]])
    bh = jnp.stack([p["b"] for p in params[1:-1]])
    wl = params[-1]["w"]
    bl = params[-1]["b"]
    out = pl.pallas_call(
        partial(_vgh_kernel_pipe, spec=spec, tile=tile,
                compute_dtype=compute_dtype),
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
        out_specs=pl.BlockSpec((tile, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 16), jnp.float32),
    )(x.astype(jnp.float32), w1, b1, wh, bh, wl, bl)
    return out[:, 0], out[:, 1:4], out[:, 4:10]


def bench(fn, params, spec, x, tile, reps=4):
    @jax.jit
    def chain(params, x):
        f = None
        for _ in range(reps):
            f, g, h6 = fn(params, spec, x, tile=tile)
            x = x + 1e-12 * g
        return x, f

    from diffudf_tpu.utils.timing import force_sync

    x1, f = chain(params, x)
    force_sync(f)
    t0 = time.perf_counter()
    _, f = chain(params, x1)
    force_sync(f)
    dt = time.perf_counter() - t0
    return x.shape[0] * reps * MF_VGH_FWD / 1e6 / dt


def main():
    from diffudf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    spec = SirenSpec(hidden=(H,) * 8)
    params = init_siren(jax.random.PRNGKey(0), spec)
    n = 262144
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (n, 3)), jnp.float32)

    # correctness first
    f0, g0, h0 = vgh_pallas(params, spec, x[:4096], tile=256)
    f1, g1, h1 = vgh_pipe(params, spec, x[:4096], tile=256)
    err = max(float(jnp.abs(f0 - f1).max()),
              float(jnp.abs(g0 - g1).max()),
              float(jnp.abs(h0 - h1).max()))
    print(f"pipelined-vs-baseline max |err|: {err:.3e}", flush=True)

    out = {}
    for tile in (256, 512):
        out[f"baseline_t{tile}"] = round(bench(vgh_pallas, params, spec, x, tile), 1)
        print(f"baseline tile={tile}: {out[f'baseline_t{tile}']}", flush=True)
        out[f"pipelined_t{tile}"] = round(bench(vgh_pipe, params, spec, x, tile), 1)
        print(f"pipelined tile={tile}: {out[f'pipelined_t{tile}']}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
