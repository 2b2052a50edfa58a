#!/usr/bin/env python
"""Benchmark: full MeshUDF extraction wall time at N=256 on a fitted field.

Workload = the reference's ``generate_mc`` MeshUDF path: N=256 grid field
extraction (pseudo-UDF + direction field) + voted-sign BFS + triangulation +
cleanup, end to end, warm.  The model is fitted in-process (flagship 8×256
recipe on a sphere cloud) so gating/banding behave realistically.

Prints ONE json line:
  {"metric": "mu_extraction_sec", "value": S, "unit": "s", "vs_baseline": R}

vs_baseline: the reference's own extraction evaluates 16.7M lattice points
through ``src/evaluate.py`` in 4096-point chunks (1 forward + 4 backward
passes each, D2H per chunk) before the native MC — ~120 s on its single-GPU
setup by the reference's chunk throughput (conservative; its pure-Python CAP
loop is minutes on top).  Treat the ratio as an estimate.
"""

import json
import time

import numpy as np


def main():
    import jax

    from diffudf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from diffudf_tpu.config import TrainConfig
    from diffudf_tpu.data.sampling import TrainingSampler
    from diffudf_tpu.extract.meshudf import extract_mesh_meshudf
    from diffudf_tpu.fields.siren import SirenSpec
    from diffudf_tpu.grid.lattice import extract_fields_sparse
    from diffudf_tpu.train.loop import Trainer
    from diffudf_tpu.utils.timing import force_sync

    rng = np.random.default_rng(123)
    pts = rng.normal(size=(100000, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= 0.7
    normals = (pts / 0.7).astype(np.float32)

    alpha = 10.0
    cfg = TrainConfig(
        num_epochs=3000, s1_epochs=2000, warmup_epochs=1000,
        batch_size=30000, alpha=alpha,
        lr_s1=1e-5, lr_s2=1e-7, warmup_lr=1e-4,
    )
    spec = SirenSpec(hidden=(256,) * 8)
    sampler = TrainingSampler.from_point_cloud(
        pts, normals, cfg.batch_size, cfg.sampling_percentiles
    )
    trainer = Trainer(spec, sampler, cfg)
    state, _, _ = trainer.run(chunk_size=500)
    params = state.best_params
    force_sync(params[0]["w"])

    N = 256

    def run():
        udf, dirs = extract_fields_sparse(params, spec, N, "tanh", alpha)
        verts, faces = extract_mesh_meshudf(udf, dirs)
        return len(faces)

    n_faces = run()  # warm: compiles the sparse-pass executables
    assert n_faces > 1000, "extraction produced a degenerate mesh"

    # median of several runs: the remote platform shows multi-second
    # service-side latency spikes that would dominate a mean
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        n_faces = run()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    baseline = 120.0  # seconds, reference chunked grid eval + native MC (est.)
    print(json.dumps({
        "metric": "mu_extraction_sec",
        "value": round(dt, 2),
        "unit": "s",
        "vs_baseline": round(baseline / dt, 1),
    }))


if __name__ == "__main__":
    main()
