#!/usr/bin/env python
"""Oracle-build scaling: candidate-grid build seconds vs triangle count.

The mesh-mode GT oracle's one-shot host build
(``data/mesh_distance.build_candidate_grid`` — exact top-k lower bounds
via a centroid cKDTree with per-cell escalation) is the dominant
per-shape host cost.  This experiment pins how it scales with the
triangle count T across the asset ladder, from the 2k-face beetle to a
garment-class ≥100k-face dress (the regime of the reference's published
DeepFashion / Multi-Garment tables, ``cuantitative.py:33-59``):

    python scripts/exp_oracle_scaling.py            # full ladder
    python scripts/exp_oracle_scaling.py --quick    # skip the 500k point

Writes ``results/ORACLE_build_scaling.json``: per asset T, build wall
seconds (pure host numpy/cKDTree, no device traffic — the exact function
the ``data/async_build.py`` background thread runs), and the candidate
table's device materialisation time.  Box-load variance on this 1-core
host is ±30%; the table records best-of-``--repeats``.

Assets are regenerated on demand (``make_demo`` / ``make_garment`` grids,
the reference beetle via ``cli.preprocess``).
"""

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "scripts"))


def tri_verts_of(mesh):
    from diffudf_tpu.data.normalize import normalize_mesh

    mesh, _ = normalize_mesh(mesh)
    v = np.asarray(mesh.vertices, np.float32)
    return v[np.asarray(mesh.faces, np.int64)]  # (T, 3, 3)


def assets(include_xl=True):
    """Yield (name, tri_verts) in ascending triangle count."""
    import make_demo
    import make_garment

    from diffudf_tpu.data.mesh_io import load_mesh
    from diffudf_tpu.data.normalize import normalize_mesh

    beetle_src = "/root/reference/data/beetle/beetle.obj"
    if osp.exists(beetle_src):
        mesh, _ = normalize_mesh(load_mesh(beetle_src))
        yield "beetle", np.asarray(mesh.vertices, np.float32)[
            np.asarray(mesh.faces, np.int64)
        ]
    yield "torus", tri_verts_of(make_demo.torus())
    yield "skirt", tri_verts_of(make_demo.skirt())
    yield "cloth", tri_verts_of(make_demo.cloth())
    yield "garment", tri_verts_of(make_garment.garment())
    if include_xl:
        yield "garment_xl", tri_verts_of(make_garment.garment(896, 288))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="skip the ~500k-triangle garment_xl point")
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--out", default=osp.join(REPO, "results",
                                             "ORACLE_build_scaling.json"))
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from diffudf_tpu.data.mesh_distance import (
        build_candidate_grid,
        build_triangle_table,
    )
    from diffudf_tpu.utils.timing import force_sync

    rows = []
    for name, tv in assets(include_xl=not args.quick):
        t_build = float("inf")
        for _ in range(max(1, args.repeats)):
            t0 = time.perf_counter()
            cand = build_candidate_grid(tv, as_numpy=True)
            t_build = min(t_build, time.perf_counter() - t0)
        t0 = time.perf_counter()
        table = build_triangle_table(jnp.asarray(tv), jnp.asarray(cand))
        force_sync(table)
        t_table = time.perf_counter() - t0
        row = {
            "asset": name,
            "triangles": int(len(tv)),
            "build_seconds": round(t_build, 3),
            "table_device_seconds": round(t_table, 3),
            "cand_shape": list(cand.shape),
        }
        rows.append(row)
        print(json.dumps(row))

    out = {
        "what": "build_candidate_grid host wall vs triangle count "
                f"(best of {args.repeats}; 1-core host, ±30% under load)",
        "rows": rows,
    }
    os.makedirs(osp.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
