#!/usr/bin/env python
"""Fingerprint the platform numerics with a deterministic short training run.

Same code + same data + same seed reproduced a 3-4x different normal-
consistency endpoint across two days on the remote-compiled TPU platform
(see PERFORMANCE.md "Platform numerics drift"): the backend's fused
executables (notably the sine transcendental) change between service
versions, and 3000 chaotic epochs amplify any ULP-level difference into a
different (equally converged, differently noisy) minimum.  This probe
makes that drift *observable in seconds*: a fixed 200-epoch stage-1 run on
a synthetic sphere cloud whose final loss and parameter checksum are
bit-stable on a fixed platform version, and shift when the backend does.

    python scripts/drift_probe.py            # prints one JSON line
    python scripts/drift_probe.py --log      # also appends to results/drift_log.jsonl

Compare against the committed history in results/drift_log.jsonl: an
entry with matching jax/jaxlib and differing param_sum/final_loss means
the remote service numerics moved underneath you — expect NC endpoints of
full runs to sit in a different (typically 0.002-0.03) band than the CSVs
of other days, with Chamfer-L1 unaffected.
"""

import argparse
import datetime
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--log", action="store_true",
                   help="append the result to results/drift_log.jsonl")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch", type=int, default=30000,
                   help="batch size (reduce for a quick CPU smoke run)")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from diffudf_tpu.config import TrainConfig
    from diffudf_tpu.data.sampling import TrainingSampler
    from diffudf_tpu.fields.siren import SirenSpec
    from diffudf_tpu.train.loop import Trainer
    from diffudf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(20000, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    normals = pts.copy()
    pts = (0.7 * pts).astype(np.float32)

    cfg = TrainConfig(
        num_epochs=args.epochs, s1_epochs=args.epochs, warmup_epochs=0,
        batch_size=args.batch, alpha=10.0, seed=123,
        lr_s1=1e-5, lr_s2=1e-7,
    )
    spec = SirenSpec(hidden=(256,) * 8)
    sampler = TrainingSampler.from_point_cloud(
        pts, normals, cfg.batch_size, cfg.sampling_percentiles
    )
    trainer = Trainer(spec, sampler, cfg)
    state, _, _ = trainer.run()
    params = state.best_params
    leaves = jax.tree_util.tree_leaves(params)
    param_sum = float(sum(np.float64(np.asarray(l, np.float64).sum()) for l in leaves))
    rec = {
        "date": datetime.date.today().isoformat(),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "jax": jax.__version__,
        "epochs": args.epochs,
        "final_loss": float(state.best_loss),
        "param_sum": param_sum,
    }
    print(json.dumps(rec))
    if args.log:
        path = osp.join(osp.dirname(__file__), "..", "results", "drift_log.jsonl")
        with open(path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
