"""CLI: 2D distance-field slice diagnostics for a trained model.

Reference surface (``generate_df.py:247-266``):

    python -m diffudf_tpu.cli.generate_df <geometry> <model.npz> <out_dir/>
        [-w width] [-t surf_thresh] [--gt_mode MODE] [-a alpha] [-w0 W0]

<geometry> is a ``_t.obj`` mesh (exact GT distances) or a ``.ply`` point
cloud (nearest-point GT distances, the reference's KDTree path).
"""

from __future__ import annotations

import argparse

import numpy as np

from ..data.mesh_distance import (
    point_cloud_distance,
    point_triangle_distance,
    triangles_from_mesh,
)
from ..data.mesh_io import load_mesh, load_point_cloud
from ..fields.siren import SirenSpec
from ..grid.slices import plane_samples, predicted_slice, render_slice_figure
from ..train import checkpoint as ckpt


def generate_df(model_path, geometry_path, output_path, options):
    params = ckpt.load_params(model_path)
    spec = SirenSpec(
        hidden=tuple(options["hidden_layer_nodes"]),
        w0=options.get("weight0", 30),
        activation=options.get("activation", "sine"),
    )
    width = options.get("width", 512)
    pred = predicted_slice(params, spec, width)
    samples = plane_samples(width)
    if geometry_path.endswith(".obj"):
        mesh = load_mesh(geometry_path)
        gt = point_triangle_distance(
            samples, triangles_from_mesh(mesh.vertices, mesh.faces)
        )
    else:
        pc = load_point_cloud(geometry_path)
        gt = point_cloud_distance(samples, np.asarray(pc.points, np.float32))
    render_slice_figure(
        pred, np.abs(np.asarray(gt)), options.get("gt_mode", "tanh"),
        options.get("alpha", 1.0), width, output_path,
        surf_thresh=options.get("surf_thresh", 1e-3),
    )


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Generate distance-field slices")
    parser.add_argument("geometry_path", type=str)
    parser.add_argument("model_path", type=str)
    parser.add_argument("output_path", type=str)
    parser.add_argument("-w0", "--weight0", type=float, default=30)
    parser.add_argument("-w", "--width", type=int, default=512)
    parser.add_argument("-t", "--surf_thresh", type=float, default=1e-3)
    parser.add_argument("--gt_mode", type=str, default="tanh")
    parser.add_argument("-a", "--alpha", type=float, default=1)
    parser.add_argument("--hidden", type=int, nargs="+", default=[256] * 8)
    args = parser.parse_args(argv)
    opts = vars(args)
    opts["hidden_layer_nodes"] = opts.pop("hidden")
    generate_df(args.model_path, args.geometry_path, args.output_path, opts)


if __name__ == "__main__":
    main()
