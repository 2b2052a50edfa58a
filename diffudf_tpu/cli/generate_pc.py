"""CLI: dense point-cloud extraction from a trained model.

Reference-compatible surface (``generate_pc.py``):

    python -m diffudf_tpu.cli.generate_pc <config.json>

Config keys (``configs/pc_cfg.json``): model_path, hidden_layer_nodes, w0,
gt_mode, alpha, nsamples, ref_steps, surf_thresh, max_iter, output_path.
"""

from __future__ import annotations

import argparse
import json

from ..data.mesh_io import PointCloudData, save_point_cloud
from ..fields.siren import SirenSpec
from ..pc.sampler import generate_point_cloud, orient_normals_consistent
from ..train import checkpoint as ckpt


def generate_pc(config: dict) -> PointCloudData:
    params = ckpt.load_params(config["model_path"])
    spec = SirenSpec(
        hidden=tuple(config["hidden_layer_nodes"]),
        w0=config.get("w0", 30),
        activation=config.get("activation", "sine"),
    )
    # "shard_points": true → candidate projection sharded over all devices
    mesh = None
    if config.get("shard_points"):
        from ..parallel.mesh import data_mesh

        mesh = data_mesh()
    points, normals = generate_point_cloud(
        params, spec,
        gt_mode=config["gt_mode"], alpha=config.get("alpha", 1.0),
        num_steps=config.get("ref_steps", 5),
        num_points=config.get("nsamples", 20000),
        surf_thresh=config.get("surf_thresh", 0.01),
        max_iter=config.get("max_iter", 1000),
        mesh=mesh,
    )
    normals = orient_normals_consistent(points, normals, k=10)
    return PointCloudData(points, normals)


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Generate dense point cloud")
    parser.add_argument("config_path", type=str)
    args = parser.parse_args(argv)
    with open(args.config_path) as fh:
        config = json.load(fh)
    pc = generate_pc(config)
    save_point_cloud(config["output_path"], pc)
    print(f"Saved {len(pc.points)} points to {config['output_path']}")


if __name__ == "__main__":
    main()
