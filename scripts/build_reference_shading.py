"""Generate golden fixtures for the shading models from the REFERENCE code.

The reference's ``phong_shading`` / ``ward_reflectance``
(``/root/reference/src/render_st.py:174-245``) are pure-numpy host
functions, but their module imports open3d/torch at top level (neither is
a dependency of this repo).  This script ast-extracts just those two
function definitions plus ``normalize`` (``src/util.py:34``) from the
reference sources, executes them in a numpy-only namespace, evaluates
them on seeded random ray-hit scenes — including back-facing normals to
pin the reference's sqrt(negative)→NaN→0 Ward specular semantics — and
stores inputs + outputs as ``tests/golden/shading_golden.npz``.

The fixture is committed; ``tests/test_golden_shading.py`` runs without
the reference repo.  Re-run this script to regenerate.

    python scripts/build_reference_shading.py
"""

import ast
import os.path as osp

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
GOLDEN = osp.join(REPO, "tests", "golden")
REF_ST = "/root/reference/src/render_st.py"
REF_UTIL = "/root/reference/src/util.py"


def extract_functions(path, names):
    """Return the source of the named top-level defs in ``path``."""
    with open(path) as fh:
        src = fh.read()
    tree = ast.parse(src)
    out = []
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in names:
            out.append(ast.get_source_segment(src, node))
    missing = set(names) - {n.split("(")[0].removeprefix("def ").strip()
                            for n in (s.splitlines()[0] for s in out)}
    if missing:
        raise RuntimeError(f"functions not found in {path}: {missing}")
    return "\n\n".join(out)


def load_reference_shading():
    ns = {"np": np}
    exec(extract_functions(REF_UTIL, ["normalize"]), ns)
    exec(extract_functions(REF_ST, ["phong_shading", "ward_reflectance"]), ns)
    return ns["phong_shading"], ns["ward_reflectance"]


def make_scene(rng, n_pixels, n_hits):
    hits = np.zeros(n_pixels, bool)
    hits[rng.choice(n_pixels, size=n_hits, replace=False)] = True
    samples = rng.uniform(-1.0, 1.0, size=(n_pixels, 3))

    def unit(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    normals = unit(rng.normal(size=(n_hits, 3)))  # incl. back-facing rows
    # orthonormal principal directions per hit (for Ward)
    t = rng.normal(size=(n_hits, 3))
    pc1 = unit(np.cross(normals, t))
    pc2 = unit(np.cross(normals, pc1))
    return hits, samples, normals, pc1, pc2


def main():
    phong_ref, ward_ref = load_reference_shading()
    rng = np.random.default_rng(20260817)

    cases = {}
    for name, n_pixels, n_hits, shininess, cmap in [
        ("plain", 512, 200, -1, False),
        ("shiny", 512, 200, 40, False),
        ("cmap", 256, 100, 40, True),
    ]:
        hits, samples, normals, pc1, pc2 = make_scene(rng, n_pixels, n_hits)
        light = np.array([1.0, 2.38206, 10.0])
        camera = np.array([0.8939, 0.7, 2.86])
        color_map = (
            rng.uniform(0.0, 1.0, size=(n_hits, 3)) if cmap else None
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            phong = phong_ref(light, shininess, hits, samples, normals,
                              color_map=color_map)
            ward = ward_ref(light, camera, hits, samples, normals,
                            0.2, 0.2, pc1, pc2, color_map=color_map)
        cases[f"{name}_hits"] = hits
        cases[f"{name}_samples"] = samples
        cases[f"{name}_normals"] = normals
        cases[f"{name}_pc1"] = pc1
        cases[f"{name}_pc2"] = pc2
        cases[f"{name}_shininess"] = np.array(shininess)
        if color_map is not None:
            cases[f"{name}_color_map"] = color_map
        cases[f"{name}_phong"] = phong
        cases[f"{name}_ward"] = ward
    cases["light"] = np.array([1.0, 2.38206, 10.0])
    cases["camera"] = np.array([0.8939, 0.7, 2.86])

    out = osp.join(GOLDEN, "shading_golden.npz")
    np.savez_compressed(out, **cases)
    print(f"wrote {out}: {sorted(cases)}")


if __name__ == "__main__":
    main()
