"""Generate golden fixtures for grid-field extraction and ray marching
from the REFERENCE implementation.

Two more reference call paths pinned on a seeded SIREN (same seed-71 net
as ``build_reference_losses.py``):

  * ``extract_fields`` (``src/render_mc.py:20-101``) — the checkpoint →
    (pseudo-UDF grid, direction grid) conversion feeding every MC
    extraction: lattice ordering, |f|→inverse mapping, gradient
    normalisation and Hessian-eigenvector sign alignment.  ast-extracted
    (its module imports trimesh/mcubes/the native .so which we neither
    have nor need); runs with the importable ``src.evaluate`` +
    ``src.inverses``.
  * ``propagate_rays`` + its module-local ``evaluate``
    (``src/render_st.py:13-36,136-161``) — the sphere-tracing march:
    per-ray step/threshold/in-domain semantics.  Same ast extraction
    (render_st imports open3d at top level).

Committed as ``tests/golden/grid_rays_golden.npz`` for
``tests/test_golden_grid_rays.py``.

    python scripts/build_reference_grid_rays.py
"""

import ast
import os.path as osp
import sys

import numpy as np
import torch
import torch.nn.functional as F  # noqa: F401  (extract_fields uses F.normalize)

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
GOLDEN = osp.join(REPO, "tests", "golden")
sys.path.insert(0, "/root/reference")

from src.inverses import inverse  # noqa: E402
from src.model import SIREN  # noqa: E402


def extract_defs(path, names):
    with open(path) as fh:
        src = fh.read()
    tree = ast.parse(src)
    found = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in names:
            seg = ast.get_source_segment(src, node)
            # the reference's def-time default device=torch.device(0)
            # cannot even be evaluated without a CUDA runtime
            seg = seg.replace("torch.device(0)", "torch.device('cpu')")
            # np.bool8 alias was removed in numpy 2 (mechanical rename)
            found[node.name] = seg.replace("np.bool8", "np.bool_")
    missing = set(names) - set(found)
    if missing:
        raise RuntimeError(f"not found in {path}: {missing}")
    return found


def load_evaluate_chunked():
    """src/evaluate.py's module-level def also carries the CUDA def-time
    default, so importing the module fails on CPU — extract it instead."""
    from src.diff_operators import gradient, hessian

    ns = {"torch": torch, "np": np, "gradient": gradient, "hessian": hessian}
    exec(extract_defs("/root/reference/src/evaluate.py", ["evaluate"])["evaluate"], ns)
    return ns["evaluate"]


evaluate_chunked = load_evaluate_chunked()


def main():
    torch.manual_seed(71)
    model = SIREN(3, 1, [32, 32], w0=30)
    model.eval()
    device = torch.device("cpu")
    # shrink the head so the random field's inverse-mapped steps fall
    # below the trace threshold along the march (a raw random SIREN never
    # converges a ray); keeps plenty of sub/super-threshold variety
    with torch.no_grad():
        head = [m for m in model.modules() if isinstance(m, torch.nn.Linear)][-1]
        head.weight *= 0.1
        head.bias *= 0.1

    out = {}
    linears = [m for m in model.modules() if isinstance(m, torch.nn.Linear)]
    for i, lin in enumerate(linears):
        out[f"w{i}"] = lin.weight.detach().numpy().T.copy()
        out[f"b{i}"] = lin.bias.detach().numpy().copy()
    out["freq_w0"] = np.int64(30)

    # --- extract_fields ---------------------------------------------------
    ef_src = extract_defs(
        "/root/reference/src/render_mc.py", ["extract_fields"]
    )["extract_fields"]
    ns = {"torch": torch, "np": np, "F": F,
          "evaluate": evaluate_chunked, "inverse": inverse}
    exec(ef_src, ns)
    N, alpha = 32, 10.0
    df, vecs = ns["extract_fields"](model, torch.Tensor([[]]), N, "tanh",
                                    device, alpha)
    out["N"] = np.int64(N)
    out["alpha"] = np.float32(alpha)
    out["udf"] = df.detach().cpu().numpy().astype(np.float32)
    out["dirs"] = vecs.detach().cpu().numpy().astype(np.float32)

    # --- propagate_rays ----------------------------------------------------
    st_defs = extract_defs(
        "/root/reference/src/render_st.py", ["evaluate", "propagate_rays"]
    )
    ns_st = {"torch": torch, "np": np, "inverse": inverse}
    exec(st_defs["evaluate"], ns_st)
    exec(st_defs["propagate_rays"], ns_st)

    rng = np.random.default_rng(7)
    n_rays = 512
    t0 = rng.uniform(-0.9, 0.9, size=(n_rays, 3)).astype(np.float32)
    rays = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)
    out["ray_origins"] = t0.copy()
    out["ray_dirs"] = rays.copy()

    network_config = {"gt_mode": "tanh", "alpha": alpha}
    rendering_config = {"max_iterations": 40, "surface_threshold": 0.03}
    pos = t0.copy()
    mask = np.ones(n_rays, bool)
    hits = ns_st["propagate_rays"](model, rays.copy(), pos, mask,
                                   network_config, rendering_config, device)
    out["hit_mask"] = hits
    out["hit_positions"] = pos  # mutated in place by the reference
    out["surface_threshold"] = np.float32(0.03)
    out["max_iterations"] = np.int64(40)

    path = osp.join(GOLDEN, "grid_rays_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: hits={int(hits.sum())}/{n_rays}")


if __name__ == "__main__":
    main()
