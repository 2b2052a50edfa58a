#!/usr/bin/env python
"""Per-phase wall-clock breakdown of one sphere-traced 512² render.

The committed rays bench (results/BENCH_rays.json) times the MARCH alone;
the CLI's full-image wall was ~17 s warm in round 4 with no committed
breakdown (VERDICT round-4 weak #4).  This script splits one
``create_projectional_image``-equivalent pass stack into:

  rays (camera + cube entry) | march | hits_read (device->host) |
  hit_gather | attrs_device (f-∇-H + eigh dispatch) | attrs_read |
  shading (host numpy) | compose_png

    python scripts/profile_st.py --model <model_best.npz> \
        [--width 512] [--passes 3]  -> results/ST_phase_profile.json

Phases are timed WARM (pass 0 is a discarded warmup — in the CLI the
executables come from the persistent compile cache).  Reference
counterpart: the whole ``create_projectional_image`` pipeline
(``/root/reference/src/render_st.py:67-133``).
"""

import argparse
import json
import os.path as osp
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--hidden", type=int, nargs="*", default=[256] * 8)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--passes", type=int, default=3)
    parser.add_argument("--alpha", type=float, default=100.0)
    parser.add_argument("--camera", type=float, nargs=3, default=[2.0, 2.0, 3.5])
    parser.add_argument("--curvatures", default="none",
                        choices=("none", "mean", "gaussian"))
    parser.add_argument("--host-camera", action="store_true",
                        help="profile the f64 host camera path (the round-4 "
                             "bottleneck) instead of the on-device camera")
    parser.add_argument("--out", default=osp.join(REPO, "results",
                                                  "ST_phase_profile.json"))
    args = parser.parse_args(argv)

    from diffudf_tpu.utils.cache import enable_compilation_cache
    from diffudf_tpu.utils.timing import PhaseTimer, force_sync

    enable_compilation_cache()

    import jax.numpy as jnp

    from diffudf_tpu.fields.siren import SirenSpec
    from diffudf_tpu.render.camera import cube_entry_points, world_rays
    from diffudf_tpu.render.shading import phong_shading
    from diffudf_tpu.render.tracer import (gather_rows, hit_attributes,
                                           trace_rays_compacted)
    from diffudf_tpu.train import checkpoint as ckpt
    from diffudf_tpu.cli.generate_st import _pad

    params = ckpt.load_params(args.model)
    spec = SirenSpec(hidden=tuple(args.hidden))
    W = H = args.width
    cam = np.asarray(args.camera, np.float32)
    light = np.asarray([2.0, 2.0, 3.5], np.float32)
    rendering = {
        "surface_threshold": 0.004, "max_iterations": 100,
        "width": W, "height": H,
    }

    timer = PhaseTimer()
    rng = np.random.default_rng(0)
    colors_sum = np.zeros((H * W, 3))

    for p in range(args.passes + 1):  # pass 0 = warmup, untimed phases
        t = timer if p else PhaseTimer()
        noise = rng.normal(0.5, 0.35)
        with t.phase("rays"):
            if args.host_camera:
                rays = world_rays(W, H, 40.0, cam, noise)
                t0, valid = cube_entry_points(rays, cam, None)
                t0 = t0.astype(np.float32)
                rays = rays.astype(np.float32)
            else:
                from diffudf_tpu.render.camera import camera_rays_device

                rays, t0, valid = camera_rays_device(W, H, 40.0, cam, noise)
                force_sync(valid)
        with t.phase("march"):
            positions, hits, iters = trace_rays_compacted(
                params, spec, t0, rays,
                valid, gt_mode="tanh", alpha=args.alpha,
                surface_threshold=rendering["surface_threshold"],
                max_iterations=rendering["max_iterations"],
                fast=True, return_device=True, use_pallas=False,
            )
            force_sync(iters)
        with t.phase("hits_read"):
            hits_np = np.asarray(hits)
            hit_idx = np.flatnonzero(hits_np)
        with t.phase("hit_gather"):
            hit_pts = gather_rows(positions, hit_idx)
            pos_np = np.zeros((len(hits_np), 3), np.float32)
            pos_np[hit_idx] = hit_pts
        with t.phase("attrs_device"):
            padded, n_real = _pad(hit_pts.astype(np.float32), 4096)
            attrs = hit_attributes(
                params, spec, jnp.asarray(padded),
                curvature_mode=args.curvatures, use_pallas=False,
            )
            force_sync(attrs["normals"])
        with t.phase("attrs_read"):
            normals = np.asarray(attrs["normals"])[:n_real]
            pc1 = np.asarray(attrs["pc1"])[:n_real]
            pc2 = np.asarray(attrs["pc2"])[:n_real]
        with t.phase("shading"):
            if args.host_camera:
                hit_rays = rays[hits_np]
            else:
                hit_rays = gather_rows(rays, hit_idx)
            align = -np.sign(
                np.sum(normals * hit_rays, axis=1, keepdims=True)
            )
            normals = normals * align
            colors = phong_shading(light, 40.0, hits_np, pos_np, normals)
        with t.phase("compose"):
            colors_sum += colors

    with timer.phase("png"):
        from PIL import Image

        img = (colors_sum / args.passes * 255).astype(np.uint8)
        Image.fromarray(img.reshape(H, W, 3)).save("/tmp/st_profile.png")

    report = timer.report()
    report["_config"] = {
        "width": W, "passes": args.passes, "hits_per_pass": int(hits_np.sum()),
        "curvatures": args.curvatures, "model": args.model,
        "camera": "host_f64" if args.host_camera else "device_f32",
    }
    total = sum(v["seconds"] for k, v in report.items() if not k.startswith("_"))
    report["_total"] = {"seconds": total}
    print(json.dumps(report, indent=1))
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
