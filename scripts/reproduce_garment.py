#!/usr/bin/env python
"""Garment-class stress run: the full mesh-mode pipeline at ≥100k faces.

The reference's published tables are DeepFashion / Multi-Garment
(``cuantitative.py:33-59``) — high-poly open garments; the demo sweep
covers that regime at 16k-73k faces.  This run exercises the pipeline at
garment-class triangle count (171,008 faces, ``scripts/make_garment.py``)
with the garment recipe (α=10, 3000 epochs, mesh-input GT oracle):

    python scripts/reproduce_garment.py

Writes ``results/results_garment.csv`` (+ provenance sidecar) and
``results/protocol_floors_garment.json``.  The mesh-mode GT oracle build
at this scale is timed separately in
``results/ORACLE_build_scaling.json`` (``scripts/exp_oracle_scaling.py``);
during this run it overlaps device training (``data/async_build.py``).
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


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--samples", type=int, default=100000)
    parser.add_argument("--out", default=osp.join(REPO, "results"))
    parser.add_argument("--workdir", default=None)
    args = parser.parse_args(argv)

    from diffudf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    work = args.workdir or tempfile.mkdtemp(prefix="garment_repro_")
    dataset = osp.join(work, "garment")
    os.makedirs(dataset, exist_ok=True)

    import make_garment

    from diffudf_tpu.cli import preprocess, quantitative

    obj = osp.join(work, "garment.obj")
    if not osp.exists(osp.join(dataset, "garment_pc.ply")):
        if not osp.exists(obj):
            make_garment.main([osp.dirname(obj)])
        preprocess.main([obj, dataset + "/", "-s", str(args.samples)])

    exp_dir = osp.join(work, "results")
    quantitative.main([work, exp_dir])

    os.makedirs(args.out, exist_ok=True)
    dst = osp.join(args.out, "results_garment.csv")
    shutil.copy(osp.join(exp_dir, "results.csv"), dst)
    prov = osp.join(exp_dir, "results_provenance.json")
    if osp.exists(prov):
        shutil.copy(prov, osp.join(args.out, "results_garment_provenance.json"))
    print(f"Wrote {dst}:")
    print(open(dst).read())

    # the shape's own metric resolution limit, for context on the row
    from diffudf_tpu.data.mesh_io import load_mesh
    from diffudf_tpu.eval.chamfer import protocol_floor

    floor_l1, floor_nc = protocol_floor(
        load_mesh(osp.join(dataset, "garment_t.obj")), args.samples
    )
    floors = [{"shape": "garment", "faces": 171008,
               "floor_L1CD": round(float(floor_l1), 6),
               "floor_NC": round(float(floor_nc), 5)}]
    fpath = osp.join(args.out, "protocol_floors_garment.json")
    with open(fpath, "w") as fh:
        json.dump(floors, fh, indent=1)
        fh.write("\n")
    print(f"Wrote {fpath}: {floors}")


if __name__ == "__main__":
    main()
