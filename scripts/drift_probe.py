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

    from diffudf_tpu.utils.cache import enable_compilation_cache
    from diffudf_tpu.utils.drift import fingerprint

    enable_compilation_cache()
    rec = fingerprint(epochs=args.epochs, batch=args.batch)
    print(json.dumps(rec))
    if args.log:
        path = osp.join(osp.dirname(__file__), "..", "results", "drift_log.jsonl")
        with open(path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
