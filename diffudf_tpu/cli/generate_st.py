"""CLI: sphere-traced rendering of a trained field.

Reference-compatible surface (``generate_st.py``):

    python -m diffudf_tpu.cli.generate_st <config.json>

Config schema mirrors ``configs/st_cfg.json``: ``network_config`` (model
path / architecture / gt_mode / alpha) + ``rendering_config`` (resolution,
camera, light, shading, curvature plotting, multi-pass AA ...).
Also supports ``gt_mode: "gt"`` — tracing the ground-truth mesh distance
directly (``render_st.py:248-281`` analogue) via the on-device triangle
oracle.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..fields.siren import SirenSpec
from ..render.camera import cube_entry_points, world_rays
from ..render.shading import phong_shading, ward_reflectance
from ..render.tracer import gradient_descent_refine, hit_attributes, trace_rays
from ..train import checkpoint as ckpt


def _pad(arr, mult):
    """Pad to a power-of-4 bucket of ``mult`` — variable lengths would
    compile a fresh executable per render pass on remote platforms."""
    n = len(arr)
    cap = mult
    while cap < n:
        cap *= 4
    if cap == n:
        return arr, n
    return np.concatenate([arr, np.zeros((cap - n, *arr.shape[1:]), arr.dtype)]), n


def create_projectional_image(
    params, spec: SirenSpec, rays, t0, mask, network_config, rendering_config,
    mesh=None,
):
    """One full render pass -> (H·W, 3) colors. On-device march + geometry,
    host shading (``render_st.py:67-133`` pipeline).

    With ``mesh`` (>1 device) the march shards the ray axis across the
    device mesh (each chip runs the masked while-loop on its shard); on a
    single device the compacted tracer is faster.
    """
    import jax.numpy as jnp

    gt_mode = network_config["gt_mode"]
    alpha = network_config.get("alpha", 1.0)
    # "fast_march": mixed-bf16 field evals inside the march (default; ~2×
    # on TPU, step-length error ≲1% ≪ the convergence tolerance).  False =
    # f32 march, bit-faithful to the reference's hit set at silhouettes
    # (the end-to-end golden runs this mode).
    fast = rendering_config.get("fast_march", True)

    if mesh is not None and mesh.size > 1:
        rays_p, n_real = _pad(np.asarray(rays, np.float32), mesh.size)
        t0_p, _ = _pad(np.asarray(t0, np.float32), mesh.size)
        mask_p, _ = _pad(np.asarray(mask), mesh.size)
        positions, hits, iters = trace_rays(
            params, spec, jnp.asarray(t0_p), jnp.asarray(rays_p),
            jnp.asarray(mask_p),
            gt_mode=gt_mode, alpha=alpha,
            surface_threshold=rendering_config["surface_threshold"],
            max_iterations=rendering_config.get("max_iterations", 100),
            fast=fast,
            mesh=mesh,
        )
        positions = positions[:n_real]
        hits = hits[:n_real]
    else:
        from ..render.tracer import trace_rays_compacted

        on_device = isinstance(t0, jnp.ndarray) and not isinstance(t0, np.ndarray)
        positions, hits, iters = trace_rays_compacted(
            params, spec,
            t0 if on_device else np.asarray(t0, np.float32),
            rays if on_device else np.asarray(rays, np.float32),
            mask if on_device else np.asarray(mask),
            gt_mode=gt_mode, alpha=alpha,
            surface_threshold=rendering_config["surface_threshold"],
            max_iterations=rendering_config.get("max_iterations", 100),
            relaxation=rendering_config.get("relaxation", 1.0),
            fast=fast,
            return_device=True,
            # one-shot CLI: the XLA march compiles once ever (persistent
            # cache); the Pallas kernel would recompile per bucket (~1 min
            # each, cache-bypassing) and dominate a cold render
            use_pallas=rendering_config.get("use_pallas", False),
        )
    gd_steps = rendering_config.get("gd_steps", 0)
    if gd_steps:
        positions = gradient_descent_refine(
            params, spec, positions, hits, gt_mode=gt_mode, alpha=alpha,
            steps=gd_steps,
        )

    # materialise only the hit rows (shading never reads non-hit positions;
    # the full-frame positions download costs ~300 ms/pass on a tunneled
    # platform)
    hits_np = np.asarray(hits)
    if hits_np.sum() == 0:
        raise ValueError(
            f"Ray tracing did not converge in "
            f"{rendering_config.get('max_iterations', 100)} iterations to any "
            f"point at distance {rendering_config['surface_threshold']} or "
            f"lower from surface."
        )
    from ..render.tracer import gather_rows

    hit_idx = np.flatnonzero(hits_np)
    hit_pts = gather_rows(positions, hit_idx)
    pos_np = np.zeros((len(hits_np), 3), np.float32)
    pos_np[hit_idx] = hit_pts

    if gt_mode == "siren":
        from ..autodiff.ops import value_grad
        import jax

        padded, n_real = _pad(hit_pts.astype(np.float32), 4096)
        _, g = jax.jit(lambda p, x: value_grad(p, spec, x))(params, jnp.asarray(padded))
        normals = np.asarray(g)[:n_real]
        normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-12)
        colors = phong_shading(
            rendering_config["light_position"], rendering_config["shininess"],
            hits_np, pos_np, normals,
        )
        return colors

    curvature_mode = rendering_config.get("plot_curvatures", "none")
    padded, n_real = _pad(hit_pts.astype(np.float32), 4096)
    attrs = hit_attributes(
        params, spec, jnp.asarray(padded),
        curvature_mode=curvature_mode if curvature_mode in ("mean", "gaussian") else "none",
        # one-shot CLI: XLA path compiles once ever (see trace call above)
        use_pallas=rendering_config.get("use_pallas", False),
    )
    normals = np.asarray(attrs["normals"])[:n_real]
    pc1 = np.asarray(attrs["pc1"])[:n_real]
    pc2 = np.asarray(attrs["pc2"])[:n_real]

    # sign-align normals against the incoming rays (render_st.py:104-108);
    # device-camera rays are gathered per hit row (no full-frame download)
    if isinstance(rays, jnp.ndarray) and not isinstance(rays, np.ndarray):
        hit_rays = gather_rows(rays, hit_idx)
    else:
        hit_rays = rays[hits_np]
    align = -np.sign(np.sum(normals * hit_rays, axis=1, keepdims=True))
    normals = normals * align

    color_map = None
    if curvature_mode in ("mean", "gaussian"):
        curv = np.asarray(attrs["curvature"])[:n_real, None]
        if curvature_mode == "mean":
            curv = curv * align
        lo = np.percentile(curv, rendering_config.get("curv_low_bound", 5))
        hi = np.percentile(curv, rendering_config.get("curv_high_bound", 95))
        curv = np.clip(curv, lo, hi)
        curv -= curv.min()
        curv /= max(curv.max(), 1e-12)
        import matplotlib

        color_map = matplotlib.colormaps["RdYlBu"](curv[:, 0])[:, :3]

    if rendering_config.get("reflection_method", "blinn-phong") == "ward":
        return ward_reflectance(
            rendering_config["light_position"], rendering_config["camera_position"],
            hits_np, pos_np, normals,
            alpha1=rendering_config.get("alpha1", 0.2),
            alpha2=rendering_config.get("alpha2", 0.2),
            pc1=pc1, pc2=pc2, color_map=color_map,
        )
    return phong_shading(
        rendering_config["light_position"], rendering_config["shininess"],
        hits_np, pos_np, normals, color_map=color_map,
    )


def create_projectional_image_gt(mesh_path, rays, t0, mask, light_position,
                                 specular_comp=40, surface_eps=1e-3,
                                 max_iterations=30):
    """Trace the GT mesh distance field directly (``render_st.py:248-281``)."""
    import jax.numpy as jnp

    from ..data.mesh_distance import point_triangle_distance, triangles_from_mesh
    from ..data.mesh_io import load_mesh

    mesh = load_mesh(mesh_path)
    tris = triangles_from_mesh(mesh.vertices, mesh.faces)

    t0 = t0.copy()
    active = mask.copy()
    hits = np.zeros_like(mask)
    for _ in range(max_iterations):
        if not active.any():
            break
        d = np.asarray(point_triangle_distance(
            jnp.asarray(t0[active], jnp.float32), tris
        ))
        t0[active] += rays[active] * d[:, None]
        close = d < surface_eps
        idx = np.flatnonzero(active)
        hits[idx[close]] = True
        active[idx[close]] = False
        out = np.any(np.abs(t0) > 1.3, axis=1)
        active &= ~out
    if hits.sum() == 0:
        raise ValueError("GT ray tracing did not converge")

    # central-difference normals of the GT field
    eps = 1e-4
    pts = t0[hits]
    grads = []
    for i in range(3):
        e = np.zeros(3); e[i] = eps
        dp = np.asarray(point_triangle_distance(jnp.asarray(pts + e, jnp.float32), tris))
        dm = np.asarray(point_triangle_distance(jnp.asarray(pts - e, jnp.float32), tris))
        grads.append((dp - dm) / (2 * eps))
    normals = np.stack(grads, axis=1)
    normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-12)
    flip = np.sum(normals * rays[hits], axis=1, keepdims=True) > 0
    normals = np.where(flip, -normals, normals)
    return phong_shading(light_position, specular_comp, hits, t0, normals)


def generate_st(config: dict):
    """Multi-pass anti-aliased render -> PIL Image."""
    from PIL import Image

    network_config = config["network_config"]
    rendering = config["rendering_config"]
    W, H = rendering["width"], rendering["height"]

    rng = np.random.default_rng(config.get("seed", 0))
    colors = np.zeros((H * W, 3))
    # "shard_rays": true → march on a mesh over all devices (multi-chip);
    # default single-device compacted tracer otherwise
    mesh = None
    if rendering.get("shard_rays"):
        from ..parallel.mesh import data_mesh

        mesh = data_mesh()
    params = spec = None
    if network_config.get("gt_mode") != "gt":
        params = ckpt.load_params(network_config["model_path"])
        spec = SirenSpec(
            hidden=tuple(network_config["hidden_layer_nodes"]),
            w0=network_config.get("w0", 30),
            activation=network_config.get("activation", "sine"),
        )

    # on-device f32 camera (one fused dispatch; rays/entries never cross
    # the link) — default for the model path; the f64 host camera remains
    # under "device_camera": false (golden-parity path) and is always used
    # for the GT-trace mode and the multi-chip sharded path, which need
    # host arrays (see results/ST_phase_profile.json for why this matters:
    # the host camera was 73% of a 512² render wall on a 1-core box)
    device_camera = (
        rendering.get("device_camera", True)
        and network_config.get("gt_mode") != "gt"
        and mesh is None
    )
    for _ in range(rendering.get("sample_rate", 1)):
        noise = rng.normal(0.5, 0.35)
        if device_camera:
            from ..render.camera import camera_rays_device

            rays, t0, valid = camera_rays_device(
                W, H, rendering["fov"], rendering["camera_position"], noise,
                rendering.get("planes"),
            )
        else:
            rays = world_rays(
                W, H, rendering["fov"], rendering["camera_position"], noise
            )
            t0, valid = cube_entry_points(
                rays, rendering["camera_position"], rendering.get("planes")
            )
        if network_config.get("gt_mode") == "gt":
            colors += create_projectional_image_gt(
                config["mesh_path"], rays, t0, valid,
                np.asarray(config["light_pos"]),
                max_iterations=config.get("max_iter", 30),
                surface_eps=config.get("surface_eps", 1e-3),
            )
        else:
            colors += create_projectional_image(
                params, spec, rays, t0, valid, network_config, rendering,
                mesh=mesh,
            )

    img = (colors / rendering.get("sample_rate", 1) * 255).astype(np.uint8)
    im = Image.fromarray(img.reshape(H, W, 3))
    if rendering.get("rotation", 0):
        im = im.rotate(rendering["rotation"])
    return im


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Sphere-traced render")
    parser.add_argument("config_path", type=str)
    args = parser.parse_args(argv)
    with open(args.config_path) as fh:
        config = json.load(fh)
    im = generate_st(config)
    im.save(config["rendering_config"]["output_path"], "PNG")


if __name__ == "__main__":
    main()
