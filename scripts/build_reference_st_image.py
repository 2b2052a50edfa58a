"""Generate a golden fixture for the FULL sphere-traced-image composition
from the REFERENCE implementation.

``test_golden_shading.py`` pins Phong/Ward and ``test_golden_grid_rays.py``
pins the march, but the end-to-end ``create_projectional_image``
composition (``/root/reference/src/render_st.py:67-133``) stacks more on
top: hit gathering, Hessian-eigendecomposition normals + principal
directions, mean/gaussian curvature from the shape operator, ray
sign-alignment, percentile-clipped RdYlBu curvature colormap, and the
shading dispatch.  This script runs the reference's own composition —
ast-extracted with its importable torch deps (``src.diff_operators``,
``src.inverses``, ``src.model``) — on a tiny SIREN *fitted to a sphere*
(a raw random field never converges a ray) and commits inputs + final
per-pixel colors for three rendering variants:

  * blinn-phong, no curvature colormap,
  * blinn-phong + mean-curvature RdYlBu map,
  * ward + gaussian-curvature map.

    python scripts/build_reference_st_image.py
"""

import ast
import json
import os.path as osp
import sys

import numpy as np
import torch

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
GOLDEN = osp.join(REPO, "tests", "golden")
sys.path.insert(0, "/root/reference")

from src.diff_operators import gradient, hessian, jacobian  # noqa: E402
from src.inverses import inverse  # noqa: E402
from src.model import SIREN  # noqa: E402

REF_ST = "/root/reference/src/render_st.py"
REF_UTIL = "/root/reference/src/util.py"


def extract_defs(path, names):
    with open(path) as fh:
        src = fh.read()
    tree = ast.parse(src)
    found = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in names:
            seg = ast.get_source_segment(src, node)
            # def-time default device=torch.device(0) needs a CUDA runtime
            seg = seg.replace("torch.device(0)", "torch.device('cpu')")
            found[node.name] = seg.replace("np.bool8", "np.bool_")
    missing = set(names) - set(found)
    if missing:
        raise RuntimeError(f"not found in {path}: {missing}")
    return found


class _CmShim:
    """matplotlib.cm.get_cmap was removed in matplotlib ≥3.9; same colormap
    object through the modern registry."""

    @staticmethod
    def get_cmap(name):
        import matplotlib

        return matplotlib.colormaps[name]


def load_reference_pipeline():
    ns = {
        "torch": torch,
        "np": np,
        "F": torch.nn.functional,
        "cm": _CmShim(),
        "gradient": gradient,
        "hessian": hessian,
        "jacobian": jacobian,
        "inverse": inverse,
    }
    exec(extract_defs(REF_UTIL, ["normalize"])["normalize"], ns)
    defs = extract_defs(REF_ST, [
        "evaluate", "batched_op", "compute_curvature",
        "compute_normals_and_cd", "compute_grad", "propagate_rays",
        "grad_descent", "phong_shading", "ward_reflectance",
        "create_projectional_image",
    ])
    for name in ("evaluate", "batched_op", "compute_curvature",
                 "compute_normals_and_cd", "compute_grad", "propagate_rays",
                 "grad_descent", "phong_shading", "ward_reflectance",
                 "create_projectional_image"):
        exec(defs[name], ns)
    return ns


def fit_sphere_model(alpha=10.0, radius=0.5, steps=4000, hidden=(64, 64, 64)):
    """Fit f(x) ≈ d·tanh(α·d), d = | |x| − r | — a clean converged tanh
    field whose zero set the tracer actually hits.  Near-surface samples
    are over-weighted so the zero set is sharp (the tracer's convergence
    and the Hessian normals both live there)."""
    torch.manual_seed(71)
    model = SIREN(3, 1, list(hidden), w0=30)
    opt = torch.optim.Adam(model.parameters(), lr=3e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps)
    gen = torch.Generator().manual_seed(7)
    for it in range(steps):
        x_far = torch.rand((2048, 3), generator=gen) * 2.0 - 1.0
        sph = torch.randn((2048, 3), generator=gen)
        sph = sph / sph.norm(dim=1, keepdim=True)
        x_near = sph * (radius + 0.05 * torch.randn((2048, 1), generator=gen))
        x = torch.cat([x_far, x_near])
        d = (x.norm(dim=1) - radius).abs()
        target = d * torch.tanh(alpha * d)
        out = model(x)["model_out"].squeeze(1)
        loss = torch.mean((out - target) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        if it % 500 == 0:
            print(f"  fit step {it}: mse {loss.item():.3e}")
    model.eval()
    return model


def camera_rays(width=20, height=20, cam=(0.0, 0.0, 2.0), fov_deg=32.0):
    """Pinhole rays toward -z + slab-method cube-entry start points."""
    cam = np.asarray(cam, np.float64)
    xs = np.linspace(-1, 1, width) * np.tan(np.radians(fov_deg) / 2)
    ys = np.linspace(-1, 1, height) * np.tan(np.radians(fov_deg) / 2)
    px, py = np.meshgrid(xs, ys)
    dirs = np.stack([px.ravel(), py.ravel(), -np.ones(px.size)], axis=1)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    # slab intersection with [-1,1]^3
    with np.errstate(divide="ignore"):
        t1 = (-1.0 - cam) / dirs
        t2 = (1.0 - cam) / dirs
    tmin = np.minimum(t1, t2).max(axis=1)
    tmax = np.maximum(t1, t2).min(axis=1)
    mask = (tmax > np.maximum(tmin, 0.0))
    t_entry = np.where(mask, np.maximum(tmin, 0.0) + 1e-4, 0.0)
    t0 = cam[None, :] + dirs * t_entry[:, None]
    return dirs.astype(np.float32), t0.astype(np.float32), mask


VARIANTS = {
    "phong_none": {"reflection_method": "blinn-phong", "plot_curvatures": "none"},
    "phong_mean": {"reflection_method": "blinn-phong", "plot_curvatures": "mean"},
    "ward_gaussian": {"reflection_method": "ward", "plot_curvatures": "gaussian"},
}


def main():
    ns = load_reference_pipeline()
    model = fit_sphere_model()
    alpha = 10.0

    out = {}
    # model weights in the rebuild's (in, out) layout
    linears = [m for m in model.modules() if isinstance(m, torch.nn.Linear)]
    for i, lin in enumerate(linears):
        out[f"w{i}"] = lin.weight.detach().numpy().T.copy()
        out[f"b{i}"] = lin.bias.detach().numpy().copy()
    out["freq_w0"] = np.float64(30.0)
    out["alpha"] = np.float64(alpha)

    width = height = 20
    rays, t0, mask = camera_rays(width, height)
    out["rays"] = rays
    out["t0"] = t0
    out["mask"] = mask

    network_config = {"gt_mode": "tanh", "alpha": alpha}
    base_rendering = {
        "width": width, "height": height,
        "surface_threshold": 0.008,
        "max_iterations": 60,
        "light_position": [1.0, 2.0, 4.0],
        "camera_position": [0.0, 0.0, 2.0],
        "shininess": 40,
        "curv_low_bound": 5, "curv_high_bound": 95,
        "alpha1": 0.2, "alpha2": 0.2,
        "gd_steps": 0,
    }
    out["network_config"] = np.frombuffer(
        json.dumps(network_config).encode(), dtype=np.uint8)
    out["rendering_config"] = np.frombuffer(
        json.dumps(base_rendering).encode(), dtype=np.uint8)

    device = torch.device("cpu")
    for name, overrides in VARIANTS.items():
        rc = dict(base_rendering, **overrides)
        # propagate_rays mutates t0/mask in place — fresh copies per variant
        colors = ns["create_projectional_image"](
            model, rays.copy(), t0.astype(np.float32).copy(), mask.copy(),
            network_config, rc, device,
        )
        out[f"colors_{name}"] = np.asarray(colors, np.float64)
        print(f"  {name}: colors {colors.shape}, mean {np.mean(colors):.6f}")

    # the hit mask itself (for diagnostics): rerun the march on copies
    hits = ns["propagate_rays"](model, rays.copy(),
                                t0.astype(np.float32).copy(), mask.copy(),
                                network_config, dict(base_rendering), device)
    out["hits"] = hits
    print(f"  hits: {hits.sum()} / {hits.size}")

    path = osp.join(GOLDEN, "st_image_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
