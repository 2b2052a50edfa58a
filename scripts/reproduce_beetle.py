"""One-command reproduction of the headline beetle quality numbers.

Runs the full reference recipe (3000 epochs, 8×256 SIREN, α=100, N=256
extraction with both MC algorithms) on the reference's demo shape and
writes ``results/results_beetle.csv`` with the reference benchmark schema
(``cuantitative.py:62-63``).  The recorded per-shape time is ~41 s on one
TPU v5e chip with a warm compilation cache (reference single-GPU baseline:
363–398 s/shape); a cold cache adds one-time XLA compiles on top.

    python scripts/reproduce_beetle.py [--mesh /root/reference/data/beetle/beetle.obj]
"""

import argparse
import os
import os.path as osp
import shutil
import sys
import tempfile

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mesh", default="/root/reference/data/beetle/beetle.obj")
    parser.add_argument("--samples", type=int, default=100000)
    parser.add_argument("--out", default=osp.join(REPO, "results"))
    parser.add_argument("--workdir", default=None,
                        help="scratch dir (default: fresh temp dir)")
    args = parser.parse_args(argv)

    from diffudf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    work = args.workdir or tempfile.mkdtemp(prefix="beetle_repro_")
    dataset = osp.join(work, "beetle")
    os.makedirs(dataset, exist_ok=True)

    from diffudf_tpu.cli import preprocess, quantitative

    if not osp.exists(osp.join(dataset, "beetle_pc.ply")):
        preprocess.main([args.mesh, dataset + "/", "-s", str(args.samples)])

    # beetle uses α=100 (reference configs/train_cfg.json); the quantitative
    # driver's defaults are the α=10 garment recipe
    cfg_path = osp.join(work, "cfg.json")
    with open(cfg_path, "w") as fh:
        fh.write('{"alpha": 100}')

    exp_dir = osp.join(work, "results")
    quantitative.main([work, exp_dir, "--config", cfg_path])

    os.makedirs(args.out, exist_ok=True)
    dst = osp.join(args.out, "results_beetle.csv")
    shutil.copy(osp.join(exp_dir, "results.csv"), dst)
    prov = osp.join(exp_dir, "results_provenance.json")
    if osp.exists(prov):
        shutil.copy(prov, osp.join(args.out, "results_beetle_provenance.json"))
    print(f"Wrote {dst}:")
    print(open(dst).read())

    # enhanced (beyond-reference) variant: N=385 sparse extraction (N-1
    # divisible by 6; sparse banding keeps it ~2 s) + field reprojection +
    # Taubin smoothing of the extracted vertices (generate_mc keys
    # refine_vertices=2, taubin_iters=10 — see extract/refine.py,
    # postprocess.taubin_smooth; ladder in PERFORMANCE.md)
    import time

    from diffudf_tpu.cli.generate_mc import run_mc
    from diffudf_tpu.cli.quantitative import CSV_HEADER, mesh_metrics
    from diffudf_tpu.data.mesh_io import load_point_cloud
    from diffudf_tpu.fields.siren import SirenSpec
    from diffudf_tpu.train import checkpoint as ckpt

    params = ckpt.load_params(
        osp.join(exp_dir, "beetle", "models", "model_best.npz")
    )
    t_extract = time.perf_counter()
    mesh_mu, mesh_cap = run_mc(
        params, SirenSpec(hidden=(256,) * 8), "tanh", 385,
        osp.join(work, "enhanced.obj"), alpha=100.0, algorithm="both",
        refine_steps=2, taubin_iters=10,
    )
    t_extract = time.perf_counter() - t_extract
    # the row's time follows the reference accounting (train wall incl. GT
    # build, recon excluded) PLUS this variant's extra N=385 extraction:
    # the enhanced mesh costs its own extraction on top of the same train.
    train_time = float(open(dst).read().splitlines()[1].split(",")[1])
    gt = load_point_cloud(osp.join(dataset, "beetle_pc.ply"))
    cap = mesh_metrics(mesh_cap, gt.points, gt.normals)
    mu = mesh_metrics(mesh_mu, gt.points, gt.normals)
    dst2 = osp.join(args.out, "results_beetle_enhanced.csv")
    with open(dst2, "w") as fh:
        fh.write(CSV_HEADER)
        fh.write(f"beetle,{train_time + t_extract},"
                 f"{cap[0]},{cap[1]},{cap[2]},{mu[0]},{mu[1]},{mu[2]}\n")
    if osp.exists(prov):
        # same checkpoint + same service session as the base row
        shutil.copy(prov, osp.join(args.out,
                                   "results_beetle_enhanced_provenance.json"))
    print(f"Wrote {dst2}:")
    print(open(dst2).read())


if __name__ == "__main__":
    main()
