"""Pinhole camera: pixel rays, look-at orientation, domain-cube entry points.

Two implementations of the reference camera setup (``generate_st.py:
9-101``) — NDC pixel grid with per-pass jitter (anti-aliasing), a look-at
rotation pointing the camera at the origin, and ray×cube-face intersection
to find each ray's entry into the [-1, 1]³ field domain:

  * the numpy f64 functions below (the original, golden-pinned path);
  * :func:`camera_rays_device` — the same math as ONE jitted f32 device
    dispatch feeding the march directly.  The round-5 ST profile
    (``results/ST_phase_profile.json``) showed the host f64 camera was
    10.5 s of a 14.3 s 512² render on the 1-core box — 73% of the wall
    spent before the first field eval.  On device it is ~milliseconds and
    the rays never cross the link.  f32 rays differ from the f64 path at
    ~1e-7 relative, which can flip borderline silhouette hits — the
    golden image suite therefore pins the f64 path
    (``rendering_config["device_camera"] = false``).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np


def pixel_rays(width: int, height: int, fov_degrees: float, noise: float = 0.5):
    """(H·W, 3) camera-space ray directions through each pixel (z = −1)."""
    nx = (np.arange(width) + noise) / width
    ny = (np.arange(height) + noise) / height
    sx = 2 * nx - 1
    sy = 2 * ny - 1
    aspect = width / height
    t = np.tan(np.radians(fov_degrees) / 2)
    cx, cy = np.meshgrid(sx * aspect * t, sy * t, indexing="xy")
    rays = np.stack([cx, cy, -np.ones_like(cx)], axis=-1)
    return rays.reshape(-1, 3)


def look_at_rotation(camera_position: np.ndarray) -> np.ndarray:
    """Rotation turning −ẑ toward the origin from ``camera_position``
    (``generate_st.py:45-61`` semantics, including the degenerate branches)."""
    b = -np.asarray(camera_position, dtype=np.float64)
    b = b / np.linalg.norm(b)
    # convention: column 3 (the +z image axis) maps to b, the direction
    # from the camera toward the origin.  The reference's special-case
    # branches (generate_st.py:49-56) use the opposite convention from its
    # general branch; here all cases agree.
    if np.isclose(b[2], -1.0):  # camera on +z axis
        return np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    if np.isclose(b[2], 1.0):  # camera on -z axis
        return np.eye(3)
    up = np.array([0.0, 1.0, 0.0]) - (np.array([0.0, 1.0, 0.0]) @ b) * b
    n = np.linalg.norm(up)
    if n < 1e-6:  # camera on (or near) the ±y axis: y-up is degenerate
        up = np.array([0.0, 0.0, 1.0]) - (np.array([0.0, 0.0, 1.0]) @ b) * b
        n = np.linalg.norm(up)
    up /= n
    right = np.cross(up, b)
    return np.vstack([right, up, b]).T


def world_rays(width, height, fov, camera_position, noise: float = 0.5):
    """Unit world-space ray directions from the camera through each pixel.

    Proper pinhole: each ray passes through the camera *center* along the
    rotated pixel direction.  Deviation from the reference (documented):
    ``generate_st.py:63-66`` constructs rays from each pixel's world
    position toward the **origin** (it adds the camera position to a
    direction before normalising), which makes all rays converge at the
    origin — the field of view collapses as the camera moves away, and
    only looks plausible at the reference's close-up fov=120 config.
    """
    cam = np.asarray(camera_position, dtype=np.float64)
    R = look_at_rotation(cam)
    p = pixel_rays(width, height, fov, noise)
    # camera forward is +z in the look-at basis (R's third column points
    # from the camera toward the origin); pixel_rays uses z = −1, so flip
    d = p * np.array([1.0, 1.0, -1.0])
    d = (R @ d.T).T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d


def cube_entry_points(ray_dirs: np.ndarray, camera_position, planes=None):
    """Entry point of each ray into the axis-aligned domain cube.

    -> (start_positions (N, 3), valid_mask (N,)).  Reference semantics
    (``generate_st.py:68-101``): intersect with the 6 face planes, keep
    intersections inside the cube (±1.001 tolerance), take the nearest
    non-negative t.
    """
    cam = np.asarray(camera_position, dtype=np.float64)
    p_pos = planes if planes is not None else [1, -1, 1, -1, 1, -1]
    plane_normals = np.array(
        [[1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1]],
        dtype=np.float64,
    )
    plane_points = np.array(
        [
            [p_pos[0], 0, 0], [p_pos[1], 0, 0],
            [0, p_pos[2], 0], [0, p_pos[3], 0],
            [0, 0, p_pos[4]], [0, 0, p_pos[5]],
        ],
        dtype=np.float64,
    ) - cam

    num = np.sum(plane_points * plane_normals, axis=-1)  # (6,)
    den = ray_dirs @ plane_normals.T  # (N, 6)
    safe_den = np.where(np.abs(den) < 1e-5, 1.0, den)
    ds = num[None, :] / safe_den

    hits = ray_dirs[:, None, :] * ds[..., None] + cam  # (N, 6, 3)
    inside = np.all((hits >= -1.001) & (hits <= 1.001), axis=-1) & (np.abs(den) > 1e-5)
    ds = np.where((ds >= 0) & inside, ds, np.inf)
    t_entry = ds.min(axis=-1)
    # improvement over the reference (generate_st.py:98-99): a ray whose only
    # cube intersections lie behind the camera is invalid, not inf-positioned
    valid = inside.any(axis=-1) & np.isfinite(t_entry)
    start = np.zeros_like(ray_dirs)
    start[valid] = ray_dirs[valid] * t_entry[valid, None] + cam
    # the ±1.001 face tolerance can admit entry points a hair OUTSIDE the
    # open cube, which the tracer's in-domain test would kill on the first
    # iteration; nudge them inside (≤1e-3 off the exact ray line — far
    # below a pixel footprint)
    start[valid] = np.clip(start[valid], -1.0 + 1e-5, 1.0 - 1e-5)
    return start, valid


@partial(jax.jit, static_argnames=("width", "height", "fov_degrees", "planes"))
def _camera_rays_jit(width, height, fov_degrees, cam, rot, noise, planes):
    import jax.numpy as jnp

    # pixel grid (pixel_rays semantics, f32, on device)
    nx = (jnp.arange(width, dtype=jnp.float32) + noise) / width
    ny = (jnp.arange(height, dtype=jnp.float32) + noise) / height
    sx = 2.0 * nx - 1.0
    sy = 2.0 * ny - 1.0
    aspect = width / height
    t = np.tan(np.radians(fov_degrees) / 2).astype(np.float32)
    cx, cy = jnp.meshgrid(sx * aspect * t, sy * t, indexing="xy")
    p = jnp.stack([cx, cy, -jnp.ones_like(cx)], axis=-1).reshape(-1, 3)

    # world rays (world_rays semantics): flip z, rotate, normalise.
    # The rotation is spelled elementwise, NOT as `d @ rot.T`: on TPU the
    # default matmul precision feeds the MXU bf16 inputs, which quantizes
    # ray directions to ~2e-3 — visible as diagonal shading stripes and
    # thousands of flipped silhouette hits (measured at 256²/fov 40).
    # Three fused multiply-adds per component are exact f32 on the VPU.
    d = p * jnp.asarray([1.0, 1.0, -1.0], jnp.float32)
    d = (
        d[:, 0:1] * rot[:, 0][None, :]
        + d[:, 1:2] * rot[:, 1][None, :]
        + d[:, 2:3] * rot[:, 2][None, :]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    # cube entry (cube_entry_points semantics)
    p_pos = planes if planes is not None else (1, -1, 1, -1, 1, -1)
    plane_normals = jnp.asarray(
        [[1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1]],
        jnp.float32,
    )
    plane_points = jnp.asarray(
        [
            [p_pos[0], 0, 0], [p_pos[1], 0, 0],
            [0, p_pos[2], 0], [0, p_pos[3], 0],
            [0, 0, p_pos[4]], [0, 0, p_pos[5]],
        ],
        jnp.float32,
    ) - cam
    num = jnp.sum(plane_points * plane_normals, axis=-1)  # (6,)
    # plane normals are axis-aligned unit vectors: the dot is a component
    # pick — exact, and avoids another bf16-default matmul (see above)
    den = jnp.stack([d[:, 0], d[:, 0], d[:, 1], d[:, 1], d[:, 2], d[:, 2]],
                    axis=-1)  # (N, 6)
    safe_den = jnp.where(jnp.abs(den) < 1e-5, 1.0, den)
    ds = num[None, :] / safe_den
    hits = d[:, None, :] * ds[..., None] + cam  # (N, 6, 3)
    inside = jnp.all((hits >= -1.001) & (hits <= 1.001), axis=-1) & (
        jnp.abs(den) > 1e-5
    )
    ds = jnp.where((ds >= 0) & inside, ds, jnp.inf)
    t_entry = jnp.min(ds, axis=-1)
    valid = jnp.any(inside, axis=-1) & jnp.isfinite(t_entry)
    start = jnp.where(
        valid[:, None], d * jnp.where(valid, t_entry, 0.0)[:, None] + cam, 0.0
    )
    start = jnp.where(
        valid[:, None], jnp.clip(start, -1.0 + 1e-5, 1.0 - 1e-5), start
    )
    return d, start, valid


def camera_rays_device(width, height, fov_degrees, camera_position,
                       noise: float = 0.5, planes=None):
    """Fused on-device camera: -> (rays, entry points, valid) jax arrays.

    Same semantics as ``world_rays`` + ``cube_entry_points`` in f32, one
    jitted dispatch (the 3×3 look-at rotation stays host f64 — it is nine
    data-independent scalars).  See the module docstring for when to
    prefer the f64 host path.
    """
    import jax.numpy as jnp

    cam = np.asarray(camera_position, dtype=np.float64)
    rot = look_at_rotation(cam)
    return _camera_rays_jit(
        int(width), int(height), float(fov_degrees),
        jnp.asarray(cam, jnp.float32), jnp.asarray(rot, jnp.float32),
        jnp.float32(noise), tuple(planes) if planes is not None else None,
    )
