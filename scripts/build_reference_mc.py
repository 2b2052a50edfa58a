"""Build the reference native MC module for the current Python and
generate golden fixtures for the rebuild's extraction tests.

The reference checks in the Cython-3.0.2-generated C++
(``/root/reference/src/marching_cubes/_marching_cubes_lewiner_cy.cpp``)
plus prebuilt py3.9/3.10 ``.so``s.  This script compiles that C++ for the
*running* interpreter (one mechanical patch: numpy 2 removed direct
``PyArray_Descr::subarray`` field access in favour of the
``PyDataType_SUBARRAY`` macro), loads ``udf_mc_lewiner``, runs it on
synthetic (udf, dirs) grids, and stores inputs + reference outputs as
``tests/golden/udf_mc_<name>.npz``.

The fixtures are committed, so ``tests/test_golden_reference.py`` runs
without the reference repo or a toolchain; re-run this script to
regenerate them.

    python scripts/build_reference_mc.py [--workdir /tmp/refmc]
"""

import argparse
import os
import os.path as osp
import shutil
import subprocess
import sys
import sysconfig

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
REF = "/root/reference/src/marching_cubes"
GOLDEN = osp.join(REPO, "tests", "golden")


def build(workdir: str) -> str:
    os.makedirs(workdir, exist_ok=True)
    src = osp.join(workdir, "mc_patched.cpp")
    with open(osp.join(REF, "_marching_cubes_lewiner_cy.cpp")) as fh:
        code = fh.read()
    # numpy >= 2: direct descriptor field access was removed
    code = code.replace("__pyx_v_d->subarray", "PyDataType_SUBARRAY(__pyx_v_d)")
    with open(src, "w") as fh:
        fh.write(code)

    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    so = osp.join(workdir, f"_marching_cubes_lewiner_cy{suffix}")
    cmd = [
        "g++", "-shared", "-fPIC", "-O2",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        "-o", so, src,
    ]
    subprocess.run(cmd, check=True)
    for helper in ("_marching_cubes_lewiner.py", "_marching_cubes_lewiner_luts.py"):
        shutil.copy(osp.join(REF, helper), workdir)
    return workdir


def fixture_fields(N: int):
    """Synthetic (udf, dirs) grids: closed asymmetric, open sheet, genus-1."""
    axis = np.linspace(-1, 1, N)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    p = np.stack([x, y, z], -1)
    out = {}

    # ellipsoid (asymmetric — catches any axis-order mismatch)
    a, b, c = 0.72, 0.5, 0.34
    f = np.sqrt((x / a) ** 2 + (y / b) ** 2 + (z / c) ** 2) - 1.0
    g = np.stack([x / a**2, y / b**2, z / c**2], -1)
    g /= np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
    # metric-ish distance: |f| / |∇f| of the level function
    gl = np.linalg.norm(
        np.stack([x / a**2, y / b**2, z / c**2], -1), axis=-1
    ) / np.maximum(np.sqrt((x/a)**2 + (y/b)**2 + (z/c)**2), 1e-9)
    udf = np.abs(f) / np.maximum(gl, 1e-6)
    dirs = -np.sign(f)[..., None] * g
    out["ellipsoid"] = (udf.astype(np.float32), dirs.astype(np.float32))

    # open square patch at z = 0.05 (|x|, |y| <= 0.5)
    cx = np.clip(x, -0.5, 0.5)
    cy = np.clip(y, -0.5, 0.5)
    q = np.stack([cx, cy, np.full_like(z, 0.05)], -1)
    d = p - q
    udf = np.linalg.norm(d, axis=-1)
    dirs = -d / np.maximum(udf, 1e-9)[..., None]
    out["patch"] = (udf.astype(np.float32), dirs.astype(np.float32))

    # torus R=0.55 r=0.25 around the z axis
    rho = np.sqrt(x**2 + y**2)
    f = np.sqrt((rho - 0.55) ** 2 + z**2) - 0.25
    ring = np.stack(
        [0.55 * x / np.maximum(rho, 1e-9), 0.55 * y / np.maximum(rho, 1e-9), np.zeros_like(z)], -1
    )
    d = p - ring
    dn = np.linalg.norm(d, axis=-1, keepdims=True)
    g = d / np.maximum(dn, 1e-9)
    udf = np.abs(f)
    dirs = -np.sign(f)[..., None] * g
    out["torus"] = (udf.astype(np.float32), dirs.astype(np.float32))
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/refmc")
    parser.add_argument("-N", type=int, default=40)
    args = parser.parse_args(argv)

    workdir = build(args.workdir)
    sys.path.insert(0, workdir)
    from _marching_cubes_lewiner import udf_mc_lewiner  # noqa: E402

    os.makedirs(GOLDEN, exist_ok=True)
    voxel = 2.0 / (args.N - 1)
    for name, (udf, dirs) in fixture_fields(args.N).items():
        verts, faces, normals, values = udf_mc_lewiner(
            udf, dirs, spacing=[voxel] * 3
        )
        # the wrapper already returns vertices in array-axis order — no
        # axis flip is needed (the parity tests would catch a swap)
        verts = np.ascontiguousarray(verts)
        path = osp.join(GOLDEN, f"udf_mc_{name}.npz")
        np.savez_compressed(
            path, udf=udf, dirs=dirs,
            ref_verts=verts.astype(np.float32),
            ref_faces=faces.astype(np.int32),
        )
        print(f"{name}: V={len(verts)} F={len(faces)} -> {path}")


if __name__ == "__main__":
    main()
