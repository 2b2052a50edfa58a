"""Compute per-shape benchmark-protocol floors for a dataset directory.

The quality CSVs are only interpretable against each shape's own metric
resolution limit: two *independent* 100k samplings of the ground-truth
surface itself score a non-zero Chamfer/NC under the reference protocol
(``cuantitative.py:10-19`` conventions — see
``diffudf_tpu.eval.chamfer.protocol_floor``).  This walks a dataset dir the
same way ``cli.quantitative`` does, computes the floor for every ``_t.obj``
ground-truth mesh, and writes the committed-results sidecar:

    python scripts/protocol_floors.py data/demo results/protocol_floors_demo.json
    python scripts/protocol_floors.py /tmp/beetle_bench results/protocol_floors_beetle.json
"""

import argparse
import json
import os
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset", help="directory walked for *_t.obj meshes")
    parser.add_argument("out", help="output JSON path")
    parser.add_argument("--samples", type=int, default=100000)
    args = parser.parse_args(argv)

    from diffudf_tpu.data.mesh_io import load_mesh
    from diffudf_tpu.eval.chamfer import protocol_floor
    from diffudf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    records = []
    for dirpath, _, filenames in os.walk(args.dataset):
        for f in sorted(filenames):
            if not f.endswith("_t.obj"):
                continue
            name = f[: -len("_t.obj")]
            mesh = load_mesh(osp.join(dirpath, f))
            l1, nc = protocol_floor(mesh, n_samples=args.samples, norm=1)
            records.append({
                "shape": name,
                "floor_L1CD": round(l1, 6),
                "floor_NC": round(nc, 5),
            })
            print(records[-1])
    if not records:
        raise SystemExit(f"no *_t.obj meshes under {args.dataset}")
    with open(args.out, "w") as fh:
        json.dump(records, fh, indent=1)
        fh.write("\n")
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
