#!/usr/bin/env python
"""Baseline-evidence row: the SIREN SDF baseline (``gt_mode: siren``) on a
demo shape, full reference recipe, vs the DUDF (tanh) rows in
``results/results_demo.csv``.

The DUDF paper's own motivation (and the reference's ``gt_mode`` switch,
``train.py:338-344``) is that a vanilla signed-SIREN fit of an *unsigned*
problem grows spurious zero sheets away from the surface and cannot
represent open sheets at all.  This script commits that comparison as a
reproducible number: same recipe (3000 epochs, 30k pts/step, 8x256 net,
reference siren weights 3e3/1e2/1e2/5e1), signed-MC extraction
(``extract/sdf_mc.py``), same chamfer/NC protocol as the demo sweep.

Usage:
  python scripts/make_demo.py data/demo
  python -m diffudf_tpu.cli.preprocess data/demo/torus.obj data/demo/ -s 100000
  python scripts/siren_baseline.py [--shapes data/demo/torus ...] [--out results/results_siren_baseline.csv]

Writes one CSV row per shape (reference ``results.csv`` schema with the
two MC algorithm column groups collapsed to the single signed-MC mesh)
plus the platform-numerics provenance sidecar the other committed CSVs
carry (``cli.quantitative`` writes the same fingerprint).
"""

import argparse
import os
import os.path as osp
import shutil
import sys
import tempfile

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from diffudf_tpu.config import TrainConfig  # noqa: E402


DEMO_SHAPES = ("torus", "trefoil", "cloth", "shell", "skirt")


def run_shape(shape_stem: str, epochs: int) -> str:
    from diffudf_tpu.cli.quantitative import mesh_metrics
    from diffudf_tpu.cli.train import setup_train
    from diffudf_tpu.data.mesh_io import load_point_cloud

    workdir = tempfile.mkdtemp(prefix="siren_baseline_")
    name = osp.basename(shape_stem)
    cfg = TrainConfig.from_dict({
        "num_epochs": epochs,
        # single-stage baseline: the s1/s2 split does not apply
        "s1_epochs": epochs, "warmup_epochs": 1000,
        "dataset": shape_stem,
        "batch_size": 30000, "sampling_percentiles": [0.333, 0.666],
        "batches_per_epoch": 1, "epochs_to_checkpoint": 10 * epochs,
        "checkpoint_path": workdir, "experiment_name": name,
        "gt_mode": "siren",
        "loss_weights": [3e3, 1e2, 1e2, 5e1],
        "alpha": 10,
        "optimizer": {"type": "adam", "lr_s1": 1e-5, "lr_s2": 1e-7},
        "network": {"hidden_layer_nodes": [256] * 8, "w0": 30},
        "resolution": 256,
        "onlyPCloud": True,
    })

    t, mesh, _ = setup_train(cfg, verbose=True)
    gt = load_point_cloud(shape_stem + "_pc.ply")
    if mesh is None or len(mesh.vertices) == 0:
        # an empty zero level set is itself a result for this baseline
        row = f"{name},{t},nan,nan,nan,nan,nan,nan\n"
    else:
        l1, l2, nc = mesh_metrics(mesh, gt.points, gt.normals)
        row = f"{name},{t},{l1},{l2},{nc},{l1},{l2},{nc}\n"
    shutil.rmtree(workdir, ignore_errors=True)
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", nargs="+",
                   default=[f"data/demo/{s}" for s in DEMO_SHAPES],
                   help="preprocessed shape stems (each expects <stem>_pc.ply)")
    p.add_argument("--out", default="results/results_siren_baseline.csv")
    p.add_argument("--epochs", type=int, default=3000)
    p.add_argument("--no-provenance", action="store_true")
    args = p.parse_args(argv)

    import json

    from diffudf_tpu.cli.quantitative import CSV_HEADER, _git_rev
    from diffudf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    os.makedirs(osp.dirname(args.out), exist_ok=True)
    if not args.no_provenance:
        from diffudf_tpu.utils.drift import fingerprint

        prov = fingerprint()
        prov["git_rev"] = _git_rev()
        with open(args.out[: -len(".csv")] + "_provenance.json", "w") as fh:
            json.dump(prov, fh, indent=1)
            fh.write("\n")

    fresh = not osp.exists(args.out)
    if fresh:
        with open(args.out, "w") as fh:
            fh.write(CSV_HEADER)
    done = {line.split(",", 1)[0] for line in open(args.out).read().splitlines()[1:]}
    for shape_stem in args.shapes:
        if osp.basename(shape_stem) in done:
            print(f"Skipping {shape_stem} (already in {args.out})")
            continue
        row = run_shape(shape_stem, args.epochs)
        with open(args.out, "a") as fh:
            fh.write(row)
        print(row, end="")


if __name__ == "__main__":
    main()
