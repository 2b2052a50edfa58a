"""Decode the Lewiner MC33 lookup tables into a committed npz artifact.

The reference ships Lewiner's published case tables (Lewiner et al. 2003,
"Efficient implementation of Marching Cubes' cases with topological
guarantees") as base64 blobs in
``/root/reference/src/marching_cubes/_marching_cubes_lewiner_luts.py``
(auto-generated there from the original ``LookUpTable.h``).  This script
decodes every table once and writes
``diffudf_tpu/extract/lewiner_luts.npz`` so the rebuilt framework carries
the *data* standalone (the triangulation algorithm itself is reimplemented
vectorised in ``diffudf_tpu/extract/lewiner_mc.py``).

    python scripts/decode_lewiner_luts.py [--luts path] [--out path]
"""

import argparse
import base64
import importlib.util
import os.path as osp

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
DEFAULT_LUTS = "/root/reference/src/marching_cubes/_marching_cubes_lewiner_luts.py"
DEFAULT_OUT = osp.join(REPO, "diffudf_tpu", "extract", "lewiner_luts.npz")

# every table the triangulator needs (names as in the reference module)
TABLE_NAMES = [
    "CASES",
    "TILING1", "TILING2", "TILING3_1", "TILING3_2", "TILING4_1", "TILING4_2",
    "TILING5", "TILING6_1_1", "TILING6_1_2", "TILING6_2",
    "TILING7_1", "TILING7_2", "TILING7_3", "TILING7_4_1", "TILING7_4_2",
    "TILING8", "TILING9",
    "TILING10_1_1", "TILING10_1_1_", "TILING10_1_2", "TILING10_2", "TILING10_2_",
    "TILING11",
    "TILING12_1_1", "TILING12_1_1_", "TILING12_1_2", "TILING12_2", "TILING12_2_",
    "TILING13_1", "TILING13_1_", "TILING13_2", "TILING13_2_",
    "TILING13_3", "TILING13_3_", "TILING13_4", "TILING13_5_1", "TILING13_5_2",
    "TILING14",
    "TEST3", "TEST4", "TEST6", "TEST7", "TEST10", "TEST12", "TEST13",
    "SUBCONFIG13",
]


def decode(shape_and_text):
    shape, text = shape_and_text
    raw = base64.decodebytes(text.encode("utf-8"))
    arr = np.frombuffer(raw, dtype=np.int8).copy()
    return arr.reshape(shape)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--luts", default=DEFAULT_LUTS)
    parser.add_argument("--out", default=DEFAULT_OUT)
    args = parser.parse_args(argv)

    spec = importlib.util.spec_from_file_location("mcluts", args.luts)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    tables = {}
    for name in TABLE_NAMES:
        tables[name] = decode(getattr(mod, name))
        print(f"{name:16s} {tables[name].shape}")
    # trailing-underscore names are not valid npz keys everywhere; keep as-is
    np.savez_compressed(args.out, **tables)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
