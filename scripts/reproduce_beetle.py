"""One-command reproduction of the headline beetle quality numbers.

Runs the full reference recipe (3000 epochs, 8×256 SIREN, α=100, N=256
extraction with both MC algorithms) on the reference's demo shape and
writes ``results/results_beetle.csv`` with the reference benchmark schema
(``cuantitative.py:62-63``).  Takes a few minutes on one TPU v5e chip
(~65 s device time + XLA compiles on a cold cache).

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
    print(f"Wrote {dst}:")
    print(open(dst).read())


if __name__ == "__main__":
    main()
