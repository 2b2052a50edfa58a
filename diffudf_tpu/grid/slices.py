"""2D level-set slice diagnostics — the training's built-in eyeball test.

Re-implementation of the reference slice renderer (``generate_df.py``): on the
x=0 plane, render a 2×2 figure (GT field / predicted field / GT |∇f| /
predicted |∇f|) with masked zero-level contours to ``distance_fields.png``,
plus a normal-map image ``pred_grad.png`` where per-pixel normals come from
∇f/|∇f| when |∇f| ≥ 0.04 and from the sign-aligned Hessian top eigenvector
otherwise (``generate_df.py:86-106``).

Field evaluation is one fused on-device pass; only the final (W², ·) arrays
come back to the host for matplotlib/PIL.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..autodiff.eigh3 import top_eigenvector
from ..fields.siren import SirenSpec
from ..fields.transforms import gt_transform, gt_grad_norm
from ..ops.evaluate import evaluate_field


def plane_samples(width: int) -> np.ndarray:
    """(W², 3) samples on the x=0 plane; row = y ∈ [1,-1], col = z ∈ [1,-1]
    (matches the reference's plane construction, ``generate_df.py:62-79``)."""
    ranges = np.linspace(1.0, -1.0, width)
    zz, yy = np.meshgrid(ranges, ranges, indexing="xy")  # col→z, row→y
    samples = np.stack(
        [np.zeros_like(zz), yy, zz], axis=-1
    ).reshape(width * width, 3)
    return samples.astype(np.float32)


def predicted_slice(params, spec: SirenSpec, width: int, mesh=None):
    """-> dict of host arrays: f, grad_norm, normals (W², ·)."""
    pts = plane_samples(width)
    ev = evaluate_field(params, spec, pts, want_grad=True, want_hess=True, mesh=mesh)
    gnorm = jnp.linalg.norm(ev.grad, axis=-1)
    unit_grad = ev.grad / jnp.maximum(gnorm[:, None], 1e-12)
    hnormal = top_eigenvector(ev.hess)
    sign = jnp.where(
        jnp.sum(unit_grad * hnormal, axis=-1, keepdims=True) < 0, -1.0, 1.0
    )
    hnormal = sign * hnormal
    normals = jnp.where(gnorm[:, None] < 0.04, hnormal, unit_grad)
    return {
        "f": np.asarray(ev.f),
        "grad_norm": np.asarray(gnorm),
        "normals": np.asarray(normals),
    }


def _imagen_dist(axis, dist, width, eps, color_map="bwr_r", contour=False):
    """One masked-imshow panel with zero-level contour
    (``generate_df.py:15-48`` semantics)."""
    img = dist.reshape(width, width)
    masked = np.ma.masked_inside(img, -eps, eps)
    masked = np.ma.masked_less(masked, 0)
    pos = axis.imshow(masked, cmap=color_map, interpolation="none", vmin=-1.5, vmax=1.5)
    if contour:
        levels = np.linspace(-1.5, 1.5, 18)
        axis.contour(masked, levels=levels, colors="black", linewidths=0.5)
        pos = axis.contourf(masked, levels=levels, cmap=color_map)
    zero_band = np.ma.masked_outside(img, -eps, eps)
    axis.contour(zero_band, colors="black", linewidths=0.5)
    axis.set_xticks([])
    axis.set_yticks([])
    return pos


def render_slice_figure(
    pred: dict,
    gt_distances: np.ndarray,
    gt_mode: str,
    alpha: float,
    width: int,
    output_dir: str,
    surf_thresh: float = 1e-3,
):
    """Write distance_fields.png + pred_grad.png into ``output_dir``.

    ``gt_distances``: raw Euclidean GT distances on the plane (W²,); the GT
    transform closed forms are applied here (``generate_df.py:111-122``).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    d = np.asarray(gt_distances, dtype=np.float64)
    gt_f = np.asarray(gt_transform(gt_mode, jnp.asarray(d), alpha))
    if gt_mode == "siren":
        gt_gn = (d >= surf_thresh).astype(np.float64)
    else:
        gt_gn = np.asarray(gt_grad_norm(gt_mode, jnp.asarray(d), alpha))

    plt.rcParams.update({"font.size": 16})
    fig, axes = plt.subplots(nrows=2, ncols=2, figsize=(10, 9), dpi=300)
    pos = _imagen_dist(axes.flat[0], np.clip(gt_f, None, 1.5), width, surf_thresh, contour=True)
    _imagen_dist(axes.flat[1], np.clip(pred["f"], None, 1.5), width, surf_thresh, contour=True)
    _imagen_dist(axes.flat[2], np.clip(gt_gn, None, 1.5), width, surf_thresh)
    _imagen_dist(axes.flat[3], np.clip(pred["grad_norm"], None, 1.5), width, surf_thresh)
    axes.flat[0].set_title("Ground truth slices")
    axes.flat[1].set_title("Predicted value slices")
    axes.flat[0].set_ylabel(r"$f$", rotation=0, labelpad=12, size="large")
    axes.flat[2].set_ylabel(r"$\|\nabla f\|$", rotation=0, labelpad=24, size="large")
    fig.subplots_adjust(right=0.8)
    cbar_ax = fig.add_axes([0.85, 0.15, 0.05, 0.7])
    fig.colorbar(pos, cax=cbar_ax)
    os.makedirs(output_dir, exist_ok=True)
    fig.savefig(os.path.join(output_dir, "distance_fields.png"))
    plt.close(fig)

    # normal map: orient z-component positive, map [-1,1] -> [0,1]
    normals = pred["normals"].copy()
    normals[:, 2] *= np.sign(normals[:, 2] + 1e-30)
    grad_map = (normals + 1.0) / 2.0
    img = (grad_map.reshape(width, width, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(os.path.join(output_dir, "pred_grad.png"), "PNG")
