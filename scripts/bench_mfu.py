#!/usr/bin/env python
"""Measure MXU ceilings + SIREN-kernel TFLOP/s → results/BENCH_mfu.json.

Round-3's roofline prose claimed the f32 Pallas kernels sit at the
"f32-via-bf16x3 ceiling (197/3 = 65.7 TFLOP/s)" while the shipped step ran
109.6 steps/s × ~677 GFLOP = 74 TFLOP/s of the same matmuls — mutually
inconsistent.  This script settles it with measurements, not constants:

  1. empirical matmul ceilings on THIS chip: one big chained square-matmul
     benchmark per input regime (bf16 native, f32 at jax default precision,
     f32 at HIGHEST) — the number the kernels should be compared against;
  2. kernel-only TFLOP/s for the fused vgh forward, the vg forward, and the
     full custom-VJP fwd+bwd (f32 default and compute_dtype=bf16);
  3. the step-level number: model FLOPs/step ÷ measured step time.

FLOPs are counted the standard MFU way (2·M·N·K per matmul, independent of
how many MXU passes the precision mode needs), so "% of bf16 peak" is a
true model-FLOP utilisation.

Timing rules for the axon platform (PERFORMANCE.md "Platform gotchas"):
chain every iteration on the previous result (the service memoizes repeated
identical calls), keep the whole chain inside ONE jit (every dispatch is an
RPC), and synchronize with a device→host read, not block_until_ready.
"""

from __future__ import annotations

import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

H = 256          # flagship hidden width
L_MM = 7         # hidden matmul layers applied to the stacked carry (8 - 1)

# model-FLOP per point for the stacked-carry kernels (head/first-layer terms
# are <0.5% and are ignored, as in the round-3 model):
#   vgh carry rows = 10 (a | J0..J2 | H0..H5), vg carry rows = 4
MF_VGH_FWD = 2 * 10 * H * H * L_MM / 1e6   # 9.18 MF/pt
MF_VG_FWD = 2 * 4 * H * H * L_MM / 1e6     # 3.67 MF/pt
# backward = forward recompute + (W̄ accumulate + cotangent propagate), each
# the same stacked-matmul shape as the forward
MF_VGH_BWD = 3 * MF_VGH_FWD
MF_VG_BWD = 3 * MF_VG_FWD


def _sync(x):
    from diffudf_tpu.utils.timing import force_sync

    return force_sync(x)


def bench_matmul_ceiling(m=32768, dim=4096, iters=16, dtype="bfloat16",
                         precision=None):
    """Chained (m, dim) @ (dim, dim) matmuls inside one jit -> TFLOP/s."""
    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(dtype)
    a = jnp.asarray(np.random.default_rng(0).normal(size=(m, dim)) * 0.01, dt)
    b = jnp.asarray(np.eye(dim) + 0.001, dt)  # near-identity keeps the chain finite

    @jax.jit
    def chain(a, b):
        def body(i, y):
            return jnp.dot(y, b, precision=precision,
                           preferred_element_type=jnp.float32).astype(dt)
        return jax.lax.fori_loop(0, iters, body, a)

    out = chain(a, b)
    _sync(out)
    t0 = time.perf_counter()
    out = chain(out, b)
    _sync(out)
    dtime = time.perf_counter() - t0
    flops = 2.0 * m * dim * dim * iters
    return flops / dtime / 1e12


def bench_vgh_forward(n=262144, tile=256, compute_dtype=None, reps=4):
    """Fused (f,∇f,H) forward kernel -> TFLOP/s (chained inside one jit)."""
    import jax
    import jax.numpy as jnp

    from diffudf_tpu.fields.siren import SirenSpec, init_siren
    from diffudf_tpu.ops.pallas_vgh import vgh_pallas

    spec = SirenSpec(hidden=(H,) * 8)
    params = init_siren(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (n, 3)), jnp.float32)

    cd = None if compute_dtype is None else jnp.dtype(compute_dtype)

    @jax.jit
    def chain(params, x):
        f = None
        for _ in range(reps):  # unrolled: pallas inside scan is pathological
            f, g, h6 = vgh_pallas(params, spec, x, tile=tile, compute_dtype=cd)
            x = x + 1e-12 * g  # chain the iterations
        return x, f

    x1, f = chain(params, x)
    _sync(f)
    t0 = time.perf_counter()
    _, f = chain(params, x1)
    _sync(f)
    dt = time.perf_counter() - t0
    return n * reps * MF_VGH_FWD / 1e6 / dt


def bench_vg_forward(n=262144, tile=256, compute_dtype=None, reps=4):
    import jax
    import jax.numpy as jnp

    from diffudf_tpu.fields.siren import SirenSpec, init_siren
    from diffudf_tpu.ops.pallas_vg import vg_pallas

    spec = SirenSpec(hidden=(H,) * 8)
    params = init_siren(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (n, 3)), jnp.float32)
    cd = None if compute_dtype is None else jnp.dtype(compute_dtype)

    @jax.jit
    def chain(params, x):
        f = None
        for _ in range(reps):
            f, g = vg_pallas(params, spec, x, tile=tile, compute_dtype=cd)
            x = x + 1e-12 * g
        return x, f

    x1, f = chain(params, x)
    _sync(f)
    t0 = time.perf_counter()
    _, f = chain(params, x1)
    _sync(f)
    dt = time.perf_counter() - t0
    return n * reps * MF_VG_FWD / 1e6 / dt


def bench_vgh_fwdbwd(n=32768, compute_dtype=None, reps=4):
    """Custom-VJP fwd+bwd (training shape) -> TFLOP/s over fwd+bwd FLOPs."""
    import jax
    import jax.numpy as jnp

    from diffudf_tpu.fields.siren import SirenSpec, init_siren
    from diffudf_tpu.ops.pallas_vgh_vjp import make_vgh_op

    spec = SirenSpec(hidden=(H,) * 8)
    params = init_siren(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (n, 3)), jnp.float32)
    cd = None if compute_dtype is None else jnp.dtype(compute_dtype)
    op = make_vgh_op(spec, compute_dtype=cd)

    def loss(params, x):
        f, g, h6 = op(params, x)
        return jnp.sum(f * f) + jnp.sum(g * g) + jnp.sum(h6 * h6)

    gfun = jax.grad(loss)

    @jax.jit
    def chain(params, x):
        for _ in range(reps):
            grads = gfun(params, x)
            # chain params on the grads (tiny update, keeps iterations
            # dependent without changing the compute shape)
            params = jax.tree_util.tree_map(
                lambda p, g: p - 1e-30 * g, params, grads)
        return params

    out = chain(params, x)
    _sync(out[0]["w"])
    t0 = time.perf_counter()
    out = chain(out, x)
    _sync(out[0]["w"])
    dt = time.perf_counter() - t0
    return n * reps * (MF_VGH_FWD + MF_VGH_BWD) / 1e6 / dt


def step_level():
    """steps/s of the shipped bench step + model FLOPs/step -> TFLOP/s.

    FLOP model of the stage-1 step (matches PERFORMANCE.md "Kernel
    roofline"): surface rows (batch/3 + remainder) take the vgh custom-VJP
    (fwd+bwd), far+near rows take the vg custom-VJP (fwd+bwd).
    """
    import jax.numpy as jnp

    from diffudf_tpu.config import TrainConfig
    from diffudf_tpu.data.sampling import TrainingSampler
    from diffudf_tpu.fields.siren import SirenSpec
    from diffudf_tpu.train.loop import Trainer

    rng = np.random.default_rng(123)
    pts = rng.normal(size=(100000, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= 0.7
    normals = (pts / 0.7).astype(np.float32)

    cfg = TrainConfig(num_epochs=3000, s1_epochs=2000, warmup_epochs=1000,
                      batch_size=30000, alpha=10.0,
                      lr_s1=1e-5, lr_s2=1e-7, warmup_lr=1e-4)
    spec = SirenSpec(hidden=(H,) * 8)
    sampler = TrainingSampler.from_point_cloud(
        pts, normals, cfg.batch_size, cfg.sampling_percentiles)
    trainer = Trainer(spec, sampler, cfg)
    state = trainer.init_state()
    chunk = trainer.chunk_fn("s1")

    n_steps = 200
    warm = jnp.arange(0, n_steps, dtype=jnp.int32)
    state, _ = chunk(state, sampler, warm)
    _sync(state.params)
    idx = jnp.arange(n_steps, 2 * n_steps, dtype=jnp.int32)
    t0 = time.perf_counter()
    state, _ = chunk(state, sampler, idx)
    _sync(state.params)
    dt = time.perf_counter() - t0
    steps_per_sec = n_steps / dt

    n_surf = cfg.batch_size // 3
    n_off = cfg.batch_size - n_surf
    gf_step = (n_surf * (MF_VGH_FWD + MF_VGH_BWD)
               + n_off * (MF_VG_FWD + MF_VG_BWD)) / 1e3
    return steps_per_sec, gf_step, steps_per_sec * gf_step / 1e3


def main():
    import jax

    from diffudf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from jax import lax

    out = {"device": str(jax.devices()[0]),
           "flop_convention": "2*M*N*K model FLOPs per matmul",
           "bf16_peak_tflops_v5e": 197.0}
    path = osp.join(osp.dirname(__file__), "..", "results", "BENCH_mfu.json")

    def record(key, value):
        out[key] = value
        print(f"{key}: {value}", flush=True)
        with open(path, "w") as fh:  # partial dump survives timeouts
            json.dump(out, fh, indent=1)
            fh.write("\n")

    print("== matmul ceilings ((32768,4096)@(4096,4096) chained) ==", flush=True)
    record("ceiling_bf16_default", round(bench_matmul_ceiling(dtype="bfloat16"), 1))
    record("ceiling_f32_default", round(bench_matmul_ceiling(dtype="float32"), 1))
    record("ceiling_f32_highest", round(
        bench_matmul_ceiling(dtype="float32", precision=lax.Precision.HIGHEST), 1))

    print("== kernels ==", flush=True)
    record("vgh_fwd_f32_tflops", round(bench_vgh_forward(), 1))
    record("vgh_fwd_bf16_tflops", round(bench_vgh_forward(compute_dtype="bfloat16"), 1))
    record("vg_fwd_f32_tflops", round(bench_vg_forward(), 1))
    record("vgh_fwdbwd_f32_tflops", round(bench_vgh_fwdbwd(), 1))
    record("vgh_fwdbwd_bf16_tflops", round(
        bench_vgh_fwdbwd(compute_dtype="bfloat16"), 1))

    print("== step level ==", flush=True)
    sps, gf, tf = step_level()
    record("step_per_sec", round(sps, 2))
    record("gflop_per_step_model", round(gf, 1))
    record("step_tflops", round(tf, 1))
    record("step_mfu_vs_bf16_peak_pct", round(100 * tf / 197.0, 1))
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
