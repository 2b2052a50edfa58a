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
  python scripts/siren_baseline.py [--shape data/demo/torus] [--out results/results_siren_baseline.csv]

Writes one CSV row (reference ``results.csv`` schema with the two MC
algorithm column groups collapsed to the single signed-MC mesh).
"""

import argparse
import os
import os.path as osp
import shutil
import sys
import tempfile

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from diffudf_tpu.config import TrainConfig  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="data/demo/torus",
                   help="preprocessed shape stem (expects <stem>_pc.ply)")
    p.add_argument("--out", default="results/results_siren_baseline.csv")
    p.add_argument("--epochs", type=int, default=3000)
    args = p.parse_args(argv)

    from diffudf_tpu.cli.quantitative import CSV_HEADER, mesh_metrics
    from diffudf_tpu.cli.train import setup_train
    from diffudf_tpu.data.mesh_io import load_point_cloud

    workdir = tempfile.mkdtemp(prefix="siren_baseline_")
    name = osp.basename(args.shape)
    cfg = TrainConfig.from_dict({
        "num_epochs": args.epochs,
        # single-stage baseline: the s1/s2 split does not apply
        "s1_epochs": args.epochs, "warmup_epochs": 1000,
        "dataset": args.shape,
        "batch_size": 30000, "sampling_percentiles": [0.333, 0.666],
        "batches_per_epoch": 1, "epochs_to_checkpoint": 10 * args.epochs,
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
    gt = load_point_cloud(args.shape + "_pc.ply")
    if mesh is None or len(mesh.vertices) == 0:
        # an empty zero level set is itself a result for this baseline
        row = f"{name},{t},nan,nan,nan,nan,nan,nan\n"
    else:
        l1, l2, nc = mesh_metrics(mesh, gt.points, gt.normals)
        row = f"{name},{t},{l1},{l2},{nc},{l1},{l2},{nc}\n"

    os.makedirs(osp.dirname(args.out), exist_ok=True)
    fresh = not osp.exists(args.out)
    with open(args.out, "a") as fh:
        if fresh:
            fh.write(CSV_HEADER)
        fh.write(row)
    print(row, end="")
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
