#!/usr/bin/env python
"""Benchmark: DUDF stage-1 training throughput on the flagship workload.

Workload = the reference's headline recipe (BASELINE.md): 8×256 SIREN,
30k-point batches (1/3 surface / 1/3 far / 1/3 near), full loss_s1
(value+grad+Hessian+eigh+backward) with on-device GT sampling — i.e. one
reference "epoch" per step.

Prints ONE json line:
  {"metric": "train_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": R}
vs_baseline is against the reference's 3000 epochs / 398 s = 7.54 steps/s
(DeepFashion PC-input table, BASELINE.md).

``--mode pc`` (default, the driver's path) uses the candidate-grid *point*
oracle (the reference's published-table input mode, ``onlyPCloud``);
``--mode mesh`` uses the exact point-triangle *coordinate-table* oracle on
a synthetic triangulated sphere (the reference paper's primary input mode,
``src/dataset.py:14-70``) and also writes ``results/BENCH_mesh.json``.
``--mode dp`` measures data-parallel scaling over ALL visible devices
(shard_map over the 1-D mesh, per-device sampling, gradient psum): it
times the same s1 workload at mesh size 1 and mesh size N and writes
``results/BENCH_dp.json`` with the scaling ratio — on a single-chip
environment it degenerates to N=1 and says so in the note.
"""

import argparse
import json
import os
import time

import numpy as np


def _uv_sphere(radius=0.7, n_theta=48, n_phi=96):
    """Triangulated UV sphere -> (verts (V,3), faces (F,3)) float32/int32."""
    th = np.linspace(0, np.pi, n_theta)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    verts = radius * np.stack(
        [np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp), np.cos(tt)], axis=-1
    ).reshape(-1, 3)
    faces = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = a + n_phi
            d = b + n_phi
            faces.append((a, b, c))
            faces.append((b, d, c))
    return verts.astype(np.float32), np.asarray(faces, np.int32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=("pc", "mesh", "dp"), default="pc")
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp

    # persistent XLA compile cache: repeat runs skip the ~30 s compile
    import os

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    from diffudf_tpu.config import TrainConfig
    from diffudf_tpu.data.sampling import TrainingSampler
    from diffudf_tpu.fields.siren import SirenSpec
    from diffudf_tpu.train.loop import Trainer

    rng = np.random.default_rng(123)
    # synthetic 100k-point surface cloud (sphere) — same scale as the beetle
    pts = rng.normal(size=(100000, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= 0.7
    normals = (pts / 0.7).astype(np.float32)

    cfg = TrainConfig(
        num_epochs=3000, s1_epochs=2000, warmup_epochs=1000,
        batch_size=30000, alpha=10.0,
        lr_s1=1e-5, lr_s2=1e-7, warmup_lr=1e-4,
    )
    spec = SirenSpec(hidden=(256,) * 8)

    if args.mode == "dp":
        _dp_scaling(jax, pts, normals, spec)
        return
    if args.mode == "mesh":
        verts, faces = _uv_sphere()
        tris = verts[faces]  # (F, 3, 3)
        sampler = TrainingSampler.from_mesh(
            pts, normals, tris, cfg.batch_size, cfg.sampling_percentiles
        )
    else:
        sampler = TrainingSampler.from_point_cloud(
            pts, normals, cfg.batch_size, cfg.sampling_percentiles
        )
    trainer = Trainer(spec, sampler, cfg)
    state = trainer.init_state()

    from diffudf_tpu.utils.timing import force_sync

    chunk = trainer.chunk_fn("s1")
    n_steps = 200
    # warmup with the SAME chunk length so the timed call reuses the
    # compiled executable (scan length is a static shape); force_sync
    # (a device->host read) is the only reliable completion barrier on
    # the axon platform — block_until_ready returns early there
    warm_idx = jnp.arange(0, n_steps, dtype=jnp.int32)
    state, _ = chunk(state, sampler, warm_idx)
    force_sync(state.params)

    idx = jnp.arange(n_steps, 2 * n_steps, dtype=jnp.int32)
    t0 = time.perf_counter()
    state, logs = chunk(state, sampler, idx)
    force_sync(state.params)
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    baseline = 3000.0 / 398.0  # reference steps/s (BASELINE.md)
    rec = {
        "metric": "train_steps_per_sec" if args.mode == "pc"
        else "train_steps_per_sec_mesh",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 2),
    }
    print(json.dumps(rec))
    if args.mode == "mesh":
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "results", "BENCH_mesh.json"), "w") as fh:
            json.dump(rec, fh)
            fh.write("\n")


def _dp_scaling(jax, pts, normals, spec):
    """steps/s at mesh size 1 vs mesh size N (all visible devices)."""
    import jax.numpy as jnp

    from diffudf_tpu.config import TrainConfig
    from diffudf_tpu.data.sampling import TrainingSampler
    from diffudf_tpu.parallel.mesh import data_mesh
    from diffudf_tpu.train.loop import Trainer
    from diffudf_tpu.utils.timing import force_sync

    n = len(jax.devices())
    # batch groups must divide the mesh: 30000 -> 10000/10000/10000 splits
    # any n | 10000; otherwise bump to the nearest clean multiple
    group = -(-10000 // n) * n
    cfg = TrainConfig(
        num_epochs=3000, s1_epochs=2000, warmup_epochs=1000,
        batch_size=3 * group, sampling_percentiles=(1.0 / 3.0, 2.0 / 3.0),
        alpha=10.0, lr_s1=1e-5, lr_s2=1e-7, warmup_lr=1e-4,
    )
    sampler = TrainingSampler.from_point_cloud(
        pts, normals, cfg.batch_size, cfg.sampling_percentiles
    )

    def measure(k):
        trainer = Trainer(spec, sampler, cfg, mesh=data_mesh(k))
        state = trainer.init_state()
        chunk = trainer.chunk_fn("s1")
        n_steps = 100
        state, _ = chunk(state, sampler,
                         jnp.arange(0, n_steps, dtype=jnp.int32))
        force_sync(state.params)
        t0 = time.perf_counter()
        state, _ = chunk(state, sampler,
                         jnp.arange(n_steps, 2 * n_steps, dtype=jnp.int32))
        force_sync(state.params)
        return n_steps / (time.perf_counter() - t0)

    s1 = measure(1)
    sn = measure(n) if n > 1 else s1
    rec = {
        "metric": "dp_steps_per_sec",
        "value": round(sn, 2),
        "unit": "steps/s",
        "vs_baseline": round(sn / (3000.0 / 398.0), 2),
        "mesh_devices": n,
        "single_device_steps_per_sec": round(s1, 2),
        "scaling": round(sn / s1, 2),
        "note": ("only one device visible — DP degenerates to the "
                 "single-chip bench" if n == 1 else
                 f"shard_map DP over {n} devices, 30k union batch"),
    }
    print(json.dumps(rec))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results", "BENCH_dp.json"), "w") as fh:
        json.dump(rec, fh)
        fh.write("\n")


if __name__ == "__main__":
    main()
