#!/usr/bin/env python
"""Trefoil resolution ladder: MU NC vs extraction resolution N.

The trefoil is the one demo shape whose enhanced NC (0.0165 at N=385,
``results/results_demo_enhanced.csv``) stops well above its protocol
floor (0.0036, ``results/protocol_floors_demo.json``): a thin tube whose
curvature is at the staircase limit of the MC lattice.  Sparse
hierarchical extraction makes high N a ~2-4 s experiment, so this script
pins the full ladder — train the reference recipe once, then extract
MeshUDF at N ∈ {256, 321, 385, 449, 513} under the enhanced knobs
(``refine_vertices=2, taubin_iters=10``) and score each against the GT
cloud:

    python scripts/trefoil_ladder.py [--shape data/demo/trefoil]

Writes ``results/TREFOIL_ladder.json`` (per-N L1/L2/NC + extraction
seconds + the shape's protocol floor for reference).  Either the ladder
reaches NC < 0.010 at some N, or it shows the plateau that pins the
staircase-limit claim.
"""

import argparse
import json
import os
import os.path as osp
import sys
import tempfile
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

LADDER = (256, 321, 385, 449, 513)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default=osp.join(REPO, "data/demo/trefoil"),
                   help="preprocessed shape stem (expects <stem>_pc.ply; "
                        "mesh mode when <stem>_t.obj exists)")
    p.add_argument("--out", default=osp.join(REPO, "results",
                                             "TREFOIL_ladder.json"))
    p.add_argument("--ladder", type=int, nargs="+", default=list(LADDER))
    args = p.parse_args(argv)

    from diffudf_tpu.cli.generate_mc import run_mc
    from diffudf_tpu.cli.quantitative import DEFAULT_CONFIG, mesh_metrics
    from diffudf_tpu.cli.train import setup_train
    from diffudf_tpu.config import TrainConfig
    from diffudf_tpu.data.mesh_io import load_point_cloud
    from diffudf_tpu.eval.chamfer import protocol_floor
    from diffudf_tpu.fields.siren import SirenSpec
    from diffudf_tpu.train import checkpoint as ckpt
    from diffudf_tpu.utils.cache import enable_compilation_cache
    from diffudf_tpu.utils.drift import fingerprint

    enable_compilation_cache()

    work = tempfile.mkdtemp(prefix="trefoil_ladder_")
    name = osp.basename(args.shape)
    d = dict(DEFAULT_CONFIG)
    d.update({
        "dataset": args.shape, "experiment_name": name,
        "checkpoint_path": work,
        "onlyPCloud": not osp.exists(args.shape + "_t.obj"),
    })
    cfg = TrainConfig.from_dict(d)
    t_train, _, _ = setup_train(cfg, verbose=False)

    params = ckpt.load_params(osp.join(work, name, "models", "model_best.npz"))
    gt = load_point_cloud(args.shape + "_pc.ply")

    rows = []
    for n in args.ladder:
        t0 = time.perf_counter()
        mesh = run_mc(
            params, SirenSpec(hidden=(256,) * 8), "tanh", n,
            osp.join(work, f"mu_{n}.obj"), alpha=cfg.alpha,
            algorithm="meshudf", refine_steps=2, taubin_iters=10,
        )
        t_extract = time.perf_counter() - t0
        l1, l2, nc = mesh_metrics(mesh, gt.points, gt.normals)
        row = {
            "N": n, "L1": float(l1), "L2": float(l2), "NC": float(nc),
            "faces": int(len(mesh.faces)),
            "extract_seconds": round(t_extract, 2),
        }
        rows.append(row)
        print(json.dumps(row))

    if osp.exists(args.shape + "_t.obj"):
        from diffudf_tpu.data.mesh_io import load_mesh

        floor_l1, floor_nc = protocol_floor(load_mesh(args.shape + "_t.obj"))
    else:  # committed demo floors (same protocol) as the fallback
        with open(osp.join(REPO, "results", "protocol_floors_demo.json")) as fh:
            fl = {r["shape"]: r for r in json.load(fh)}[name]
        floor_l1, floor_nc = fl["floor_L1CD"], fl["floor_NC"]
    out = {
        "shape": name,
        "recipe": "reference defaults (3000 epochs, alpha=10) + "
                  "enhanced extraction (refine_steps=2, taubin_iters=10)",
        "train_seconds": round(float(t_train), 2),
        "protocol_floor": {"L1": float(floor_l1), "NC": float(floor_nc)},
        "fingerprint": fingerprint(),
        "ladder": rows,
    }
    os.makedirs(osp.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
