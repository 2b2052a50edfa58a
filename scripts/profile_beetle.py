#!/usr/bin/env python
"""Per-phase wall-clock breakdown of one full beetle run.

The headline per-shape number (41 s train + dual N=256 extraction) is one
scalar; this script splits it into the phases that matter for choosing the
next optimization lever and commits the result:

  preprocess | data_build (oracle grid) | train (s1+s2 device time) |
  slices | extract_device (sparse fused grid pass) | extract_host_mu |
  extract_host_cap | metrics (chamfer x2 + NC)

    python scripts/profile_beetle.py   # -> results/BEETLE_phase_profile.json

Uses the same entry points the quantitative driver uses (the per-phase sum
reproduces its CSV wall time up to the phase boundaries).  Run warm (second
invocation) for the headline breakdown — cold adds one-time XLA compiles.
"""

import argparse
import json
import os
import os.path as osp
import sys
import tempfile

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mesh", default="/root/reference/data/beetle/beetle.obj")
    parser.add_argument("--samples", type=int, default=100000)
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--out", default=osp.join(REPO, "results",
                                                  "BEETLE_phase_profile.json"))
    args = parser.parse_args(argv)

    from diffudf_tpu.utils.cache import enable_compilation_cache
    from diffudf_tpu.utils.timing import PhaseTimer, force_sync

    enable_compilation_cache()
    timer = PhaseTimer()

    work = args.workdir or tempfile.mkdtemp(prefix="beetle_prof_")
    dataset = osp.join(work, "beetle")
    os.makedirs(dataset, exist_ok=True)

    from diffudf_tpu.cli import preprocess

    with timer.phase("preprocess"):
        if not osp.exists(osp.join(dataset, "beetle_pc.ply")):
            preprocess.main([args.mesh, dataset + "/", "-s", str(args.samples)])

    import numpy as np

    from diffudf_tpu.cli.quantitative import DEFAULT_CONFIG, mesh_metrics
    from diffudf_tpu.cli.train import build_sampler
    from diffudf_tpu.config import TrainConfig
    from diffudf_tpu.data.mesh_io import load_point_cloud
    from diffudf_tpu.train.loop import Trainer

    d = dict(DEFAULT_CONFIG)
    d["dataset"] = osp.join(dataset, "beetle")
    d["alpha"] = 100  # beetle recipe (reference configs/train_cfg.json)
    d["experiment_name"] = "beetle_prof"
    d["checkpoint_path"] = work
    cfg = TrainConfig.from_dict(d)
    spec = cfg.network.to_spec()

    # data_build is timed COLD (the sweep's first-contact cost per shape);
    # the content-hashed oracle cache then makes every retrain of the same
    # asset a load — timed separately as data_build_cached
    cache_file = d["dataset"] + "_oracle_cache.npz"
    if osp.exists(cache_file):
        os.remove(cache_file)
    with timer.phase("data_build"):
        sampler, pc, mesh = build_sampler(cfg)
        trainer = Trainer(spec, sampler, cfg)
        state = trainer.init_state()
    with timer.phase("_data_build_cached"):  # excluded from _total
        build_sampler(cfg)

    # warmup train: in a sweep the (stage-shared) train graphs compile once
    # per process and amortise over every shape — and on bad service days a
    # single remote compile costs minutes (CLAUDE.md), which would swamp
    # the marginal number this artifact exists to report
    trainer.run(state=trainer.init_state())
    state = trainer.init_state()
    with timer.phase("train"):
        state, losses, train_time = trainer.run(state=state)
        force_sync(state.best_params)

    from diffudf_tpu.grid.slices import (plane_samples, predicted_slice,
                                         render_slice_figure)
    from diffudf_tpu.cli.train import gt_plane_distances

    recon = osp.join(work, "recon")
    os.makedirs(recon, exist_ok=True)
    width = 512
    # warmup pass: in a sweep these executables compile once per process
    # and amortise over every shape, so the committed per-shape numbers
    # time the warm (marginal) cost — the Pallas kernels recompile per
    # process on the remote service and would otherwise dominate
    predicted_slice(state.best_params, spec, width)
    gt_plane_distances(cfg, pc, mesh, width, sampler=sampler)  # warmup
    with timer.phase("slices_pred"):
        pred = predicted_slice(state.best_params, spec, width)
    with timer.phase("slices_gt"):
        gt_d = gt_plane_distances(cfg, pc, mesh, width, sampler=sampler)
    with timer.phase("slices_figure"):
        render_slice_figure(pred, gt_d, cfg.gt_mode, cfg.alpha, width, recon)

    from diffudf_tpu.grid.lattice import extract_fields_sparse

    extract_fields_sparse(  # warmup (see slices note)
        state.best_params, spec, cfg.resolution, cfg.gt_mode, cfg.alpha,
        use_pallas=None,
    )
    with timer.phase("extract_device"):
        udf, dirs = extract_fields_sparse(
            state.best_params, spec, cfg.resolution, cfg.gt_mode, cfg.alpha,
            use_pallas=None,
        )
        udf = np.asarray(udf)
        dirs = np.asarray(dirs)

    from diffudf_tpu.cli.generate_mc import _cap_postprocessed, _mu_postprocessed
    from diffudf_tpu.data.mesh_io import Mesh

    with timer.phase("extract_host_mu"):
        verts, faces = _mu_postprocessed(udf, dirs, None)
        mesh_mu = Mesh(verts, faces)
    with timer.phase("extract_host_cap"):
        verts, faces = _cap_postprocessed(udf, dirs, cfg.resolution)
        mesh_cap = Mesh(verts, faces)

    with timer.phase("metrics"):
        gt = load_point_cloud(osp.join(dataset, "beetle_pc.ply"))
        cap = mesh_metrics(mesh_cap, gt.points, gt.normals)
        mu = mesh_metrics(mesh_mu, gt.points, gt.normals)

    report = timer.report()
    report["_train_device_time"] = {"seconds": train_time, "calls": 1}
    report["_quality"] = {
        "cap_l1": cap[0], "cap_l2": cap[1], "cap_nc": cap[2],
        "mu_l1": mu[0], "mu_l2": mu[1], "mu_nc": mu[2],
    }
    total = sum(v["seconds"] for k, v in report.items()
                if not k.startswith("_"))
    report["_total"] = {"seconds": total}
    print(json.dumps(report, indent=1))
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
