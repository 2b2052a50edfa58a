#!/usr/bin/env python
"""Benchmark: DUDF stage-1 training throughput on the flagship workload.

Workload = the reference's headline recipe (BASELINE.md): 8×256 SIREN,
30k-point batches (1/3 surface / 1/3 far / 1/3 near), full loss_s1
(value+grad+Hessian+eigh+backward) with on-device point-cloud GT sampling —
i.e. one reference "epoch" per step.

Prints ONE json line:
  {"metric": "train_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": R}
vs_baseline is against the reference's 3000 epochs / 398 s = 7.54 steps/s
(DeepFashion PC-input table, BASELINE.md).
"""

import json
import time

import numpy as np


def main():
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
    print(json.dumps({
        "metric": "train_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
