#!/usr/bin/env python
"""One-command reproduction of the committed demo-sweep CSVs.

Generates the five demo shapes, preprocesses each into its own
subdirectory (``cli.quantitative`` treats every directory containing a
``*_pc.ply`` as one shape, mirroring the reference's per-shape layout,
``cuantitative.py:64-66``), and runs the full-recipe sweep:

    python scripts/reproduce_demo.py                 # mesh-input sweep
    python scripts/reproduce_demo.py --mode pc       # onlyPCloud sweep
    python scripts/reproduce_demo.py --mode enhanced # quality=enhanced

writing ``results/results_demo.csv`` / ``_pc.csv`` / ``_enhanced.csv``
(+ the ``*_provenance.json`` fingerprint sidecar) respectively.
~30 s/shape warm; a cold compilation cache adds one-time XLA compiles.
"""

import argparse
import json
import os
import os.path as osp
import shutil
import sys
import tempfile

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "scripts"))

SHAPES = ("torus", "trefoil", "cloth", "shell", "skirt")
MODES = {
    "mesh": ("results_demo.csv", {}),
    "pc": ("results_demo_pc.csv", {}),
    "enhanced": ("results_demo_enhanced.csv", {"quality": "enhanced"}),
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=sorted(MODES), default="mesh")
    parser.add_argument("--samples", type=int, default=100000)
    parser.add_argument("--out", default=osp.join(REPO, "results"))
    parser.add_argument("--workdir", default=None,
                        help="scratch dir (default: fresh temp dir)")
    args = parser.parse_args(argv)

    from diffudf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    work = args.workdir or tempfile.mkdtemp(prefix=f"demo_repro_{args.mode}_")
    raw = osp.join(work, "raw")
    dataset = osp.join(work, "dataset")
    os.makedirs(raw, exist_ok=True)

    import make_demo  # sibling script

    from diffudf_tpu.cli import preprocess, quantitative

    if not osp.exists(osp.join(raw, "torus.obj")):
        make_demo.main([raw])
    for shape in SHAPES:
        shape_dir = osp.join(dataset, shape)
        if osp.exists(osp.join(shape_dir, f"{shape}_pc.ply")):
            continue
        os.makedirs(shape_dir, exist_ok=True)
        preprocess.main([osp.join(raw, f"{shape}.obj"), shape_dir + "/",
                         "-s", str(args.samples)])
        if args.mode == "pc":
            # pc-input protocol: no _t.obj → the driver sets onlyPCloud
            os.remove(osp.join(shape_dir, f"{shape}_t.obj"))

    csv_name, overrides = MODES[args.mode]
    cfg_path = osp.join(work, "cfg.json")
    with open(cfg_path, "w") as fh:
        json.dump(overrides, fh)

    exp_dir = osp.join(work, "results")
    quantitative.main([dataset, exp_dir, "--config", cfg_path])

    os.makedirs(args.out, exist_ok=True)
    dst = osp.join(args.out, csv_name)
    shutil.copy(osp.join(exp_dir, "results.csv"), dst)
    prov = osp.join(exp_dir, "results_provenance.json")
    if osp.exists(prov):
        shutil.copy(prov, dst[: -len(".csv")] + "_provenance.json")
    print(f"Wrote {dst}:")
    print(open(dst).read())


if __name__ == "__main__":
    main()
