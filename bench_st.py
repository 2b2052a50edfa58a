#!/usr/bin/env python
"""Benchmark: full sphere-traced IMAGE wall time (not just the march).

``bench_rays.py`` times the march alone; this measures the complete
512²×3-pass render a user gets from ``cli.generate_st`` — on-device
camera + cube entry, compacted march, hit gather, Hessian hit attributes,
host shading, composition — on a trained field.

Prints ONE json line:
  {"metric": "st_image_512_seconds", "value": S, "unit": "s",
   "vs_baseline": R}

Baseline: the reference's ``create_projectional_image`` marches 512²×3
rays at its measured ~0.045 Mrays/s chunked host-loop rate
(``src/render_st.py:136-161``; BASELINE.md 10× target basis) = 17.5 s for
the march ALONE, before its Hessian eigendecomposition, curvature and
numpy shading passes — so ``vs_baseline`` (reference march-only time /
our full-image time) UNDERSTATES the true end-to-end ratio.

    python bench_st.py --model <model_best.npz> [--alpha 100]
"""

import argparse
import json
import os
import os.path as osp
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--hidden", type=int, nargs="*", default=[256] * 8)
    parser.add_argument("--alpha", type=float, default=100.0)
    parser.add_argument("--camera", type=float, nargs=3,
                        default=[2.0, 2.0, 3.5])
    args = parser.parse_args()

    from diffudf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from diffudf_tpu.cli.generate_st import generate_st
    from diffudf_tpu.utils.timing import force_sync  # noqa: F401 (doc)

    config = {
        "network_config": {
            "model_path": args.model,
            "hidden_layer_nodes": list(args.hidden),
            "w0": 30, "gt_mode": "tanh", "alpha": args.alpha,
        },
        "rendering_config": {
            "width": 512, "height": 512, "fov": 40.0,
            "camera_position": list(args.camera),
            "light_position": [2.0, 2.0, 3.5],
            "shininess": 40, "surface_threshold": 0.004,
            "max_iterations": 100, "sample_rate": 3,
        },
        "seed": 0,
    }

    generate_st(config)  # warmup: executables + compile cache
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        generate_st(config)
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times))

    baseline_march_only = (512 * 512 * 3) / 45_000.0  # s, reference rate
    rec = {
        "metric": "st_image_512_seconds",
        "value": round(sec, 2),
        "unit": "s",
        "vs_baseline": round(baseline_march_only / sec, 2),
        "spread": [round(min(times), 2), round(max(times), 2)],
        "note": ("full 512^2 x 3-pass render via cli.generate_st (device "
                 "camera + compacted march + hit attrs + host shading); "
                 "baseline = reference march time ALONE at 0.045 Mrays/s, "
                 "so the ratio understates end-to-end"),
    }
    print(json.dumps(rec))
    with open(osp.join(osp.dirname(osp.abspath(__file__)), "results",
                       "BENCH_st_image.json"), "w") as fh:
        json.dump(rec, fh)
        fh.write("\n")


if __name__ == "__main__":
    main()
