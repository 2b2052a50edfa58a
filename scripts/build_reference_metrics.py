"""Generate golden fixtures for the quantitative evaluator (Chamfer + NC).

Every quality number in results/*.csv flows through ``eval/chamfer.py``;
this pins it the same way the other golden suites pin the model/losses:
by running the REFERENCE's own metric code on committed inputs.

The reference's metric path is ``cuantitative.py:10-19`` — a thin wrapper
over ``pytorch3d.loss.chamfer_distance``.  pytorch3d itself is CUDA-heavy
and not installable here, so this generator injects a faithful plain-torch
implementation of ``chamfer_distance`` (transcribed from pytorch3d
``pytorch3d/loss/chamfer.py`` @ v0.7 semantics, the version pinned by the
reference env ``dudf.yml``) as a ``pytorch3d.loss`` module, then imports
and executes the reference's own ``metrics()`` source via AST extraction —
so the tensor prep (``.float()``, batching) is the reference's code, and
the distance semantics are pytorch3d's documented algorithm:

  * knn under ``norm``: 1 → Σ|Δ| (L1), 2 → Σ Δ² (squared L2, no root);
  * point_reduction="mean", batch_reduction="mean" (defaults);
  * returned cd = cham_x + cham_y (sum of the two directional means);
  * normal consistency = 1 − |cosine_similarity(n_x, n_NN, eps=1e-6)|,
    same reductions, summed over directions (abs_cosine=True default).

    python scripts/build_reference_metrics.py
"""

import ast
import os.path as osp
import sys
import types

import numpy as np
import torch
import torch.nn.functional as F

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
GOLDEN = osp.join(REPO, "tests", "golden")


def chamfer_distance_torch(x, y, x_normals=None, y_normals=None, norm=2):
    """pytorch3d.loss.chamfer_distance, plain-torch transcription.

    x: (N, P1, D), y: (N, P2, D); defaults point_reduction="mean",
    batch_reduction="mean", abs_cosine=True.  Brute-force knn (K=1).
    """
    assert x.dim() == 3 and y.dim() == 3 and x.shape[0] == y.shape[0]
    N = x.shape[0]
    cham, cham_norm = x.new_zeros(()), x.new_zeros(())
    for b in range(N):
        xb, yb = x[b], y[b]
        delta = xb[:, None, :] - yb[None, :, :]
        if norm == 2:
            d = (delta * delta).sum(-1)
        elif norm == 1:
            d = delta.abs().sum(-1)
        else:
            raise ValueError("norm must be 1 or 2")
        dx, ix = d.min(dim=1)      # x -> nearest y
        dy, iy = d.min(dim=0)      # y -> nearest x
        cham = cham + dx.mean() + dy.mean()
        if x_normals is not None and y_normals is not None:
            xn, yn = x_normals[b], y_normals[b]
            cos_x = F.cosine_similarity(xn, yn[ix], dim=1, eps=1e-6)
            cos_y = F.cosine_similarity(yn, xn[iy], dim=1, eps=1e-6)
            cham_norm = cham_norm + (1 - cos_x.abs()).mean() + (1 - cos_y.abs()).mean()
    cd = cham / N
    nc = cham_norm / N if x_normals is not None and y_normals is not None else None
    return cd, nc


def load_reference_metrics():
    """AST-extract ``metrics`` from /root/reference/cuantitative.py and bind
    it against the transcription above (the module's other imports —
    pytorch3d CUDA, open3d, the training stack — don't exist here)."""
    src = open("/root/reference/cuantitative.py").read()
    tree = ast.parse(src)
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "metrics")
    mod = ast.Module(body=[fn], type_ignores=[])
    ns = {
        "torch": torch,
        "np": np,
        "chamfer_distance": chamfer_distance_torch,
    }
    exec(compile(mod, "cuantitative.py", "exec"), ns)
    return ns["metrics"]


class _FakeGeom:
    """Duck-typed stand-ins for the trimesh mesh / o3d point cloud the
    reference's metrics() reads (.vertices/.vertex_normals, .points/.normals)."""

    def __init__(self, **arrays):
        self.__dict__.update(arrays)


def main():
    metrics = load_reference_metrics()
    rng = np.random.default_rng(2024)

    cases = {}

    def add_case(name, verts, vnorms, pts, pnorms):
        mesh = _FakeGeom(vertices=verts, vertex_normals=vnorms)
        pc = _FakeGeom(points=pts, normals=pnorms)
        for norm in (1, 2):
            cd, nc = metrics(mesh, pc, norm, "cpu")
            cases[f"{name}_cd_l{norm}"] = np.float64(cd)
            cases[f"{name}_nc_l{norm}"] = np.float64(nc)
        cases[f"{name}_verts"] = verts.astype(np.float32)
        cases[f"{name}_vnorms"] = vnorms.astype(np.float32)
        cases[f"{name}_pts"] = pts.astype(np.float32)
        cases[f"{name}_pnorms"] = pnorms.astype(np.float32)

    # 1. generic random clouds, unequal sizes
    v = rng.uniform(-1, 1, (1531, 3))
    vn = rng.normal(size=(1531, 3))
    vn /= np.linalg.norm(vn, axis=1, keepdims=True)
    p = rng.uniform(-1, 1, (2200, 3))
    pn = rng.normal(size=(2200, 3))
    pn /= np.linalg.norm(pn, axis=1, keepdims=True)
    add_case("random", v, vn, p, pn)

    # 2. two samplings of a sphere with analytic normals (benchmark-like:
    # small distances, highly correlated normals)
    a = rng.normal(size=(1800, 3)); a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = rng.normal(size=(2048, 3)); b /= np.linalg.norm(b, axis=1, keepdims=True)
    add_case("sphere", 0.7 * a, a, 0.7 * b, b)

    # 3. degenerate rows: duplicated points (distance ties) + a zero normal
    # (exercises the eps=1e-6 guard)
    v = rng.uniform(-1, 1, (600, 3))
    v[10] = v[11]
    vn = rng.normal(size=(600, 3)); vn /= np.linalg.norm(vn, axis=1, keepdims=True)
    vn[42] = 0.0
    p = v[rng.integers(0, 600, 800)] + 0.01 * rng.normal(size=(800, 3))
    pn = rng.normal(size=(800, 3)); pn /= np.linalg.norm(pn, axis=1, keepdims=True)
    add_case("degenerate", v, vn, p, pn)

    # 4. unnormalized vertex normals (area-weighted, as raw accumulation
    # would give) — cosine_similarity must normalize internally
    v = rng.uniform(-1, 1, (700, 3))
    vn = rng.normal(size=(700, 3)) * rng.uniform(0.1, 5.0, (700, 1))
    p = rng.uniform(-1, 1, (900, 3))
    pn = rng.normal(size=(900, 3)) * rng.uniform(0.1, 5.0, (900, 1))
    add_case("unnormalized", v, vn, p, pn)

    out = osp.join(GOLDEN, "metrics_golden.npz")
    np.savez_compressed(out, **cases)
    print(f"wrote {out} ({len(cases)} arrays)")
    for k in sorted(cases):
        if k.endswith(("_l1", "_l2")):
            print(f"  {k}: {cases[k]:.10f}")


if __name__ == "__main__":
    main()
