"""Shading models: Blinn-Phong and anisotropic Ward.

Host-side numpy, mirroring the reference formulas exactly
(``src/render_st.py:174-245``): same default grey albedo (0.7 diffuse /
0.7 specular / 0.2 ambient), same 0.9 clip, same Ward weight with the
principal-direction anisotropy terms.
"""

from __future__ import annotations

import numpy as np


def _normalize(a):
    return a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)


def _colors(color_map, n):
    if color_map is None:
        grey = np.tile(np.array([0.7, 0.7, 0.7]), (n, 1))
        return grey, grey.copy(), np.tile(np.array([0.2, 0.2, 0.2]), (n, 1))
    return color_map * 0.7, color_map * 0.7, color_map * 0.2


def phong_shading(light_position, shininess, hits, samples, normals, color_map=None):
    """(image colors (N_pixels, 3)); non-hit pixels stay white."""
    light_position = np.asarray(light_position, dtype=np.float64)
    pts = samples[hits]
    n = len(pts)
    light_dirs = _normalize(light_position[None, :] - pts)
    lambertian = np.maximum(np.sum(normals * light_dirs, axis=1, keepdims=True), 0.0)

    reflect = (-light_dirs) - 2.0 * np.sum(normals * (-light_dirs), axis=1, keepdims=True) * normals
    view = _normalize(pts)
    spec_angles = np.maximum(np.sum(reflect * view, axis=1), 0.0)

    specular = np.zeros_like(lambertian)
    if shininess > 0:
        s = np.power(spec_angles, shininess)[:, None]
        specular[lambertian[:, 0] > 0] = s[lambertian[:, 0] > 0]

    diffuse_c, spec_c, ambient_c = _colors(color_map, n)
    colors = np.ones_like(samples)
    colors[hits] = np.clip(
        diffuse_c * lambertian + spec_c * specular + ambient_c, 0.0, 0.9
    )
    return colors


def ward_reflectance(
    light_position, camera_position, hits, samples, normals,
    alpha1, alpha2, pc1, pc2, color_map=None,
):
    """Anisotropic Ward BRDF using principal curvature directions."""
    light_position = np.asarray(light_position, dtype=np.float64)
    camera_position = np.asarray(camera_position, dtype=np.float64)
    pts = samples[hits]
    n = len(pts)
    light_dirs = _normalize(light_position[None, :] - pts)
    lambertian = np.maximum(np.sum(normals * light_dirs, axis=1, keepdims=True), 0.0)

    viewer_dirs = _normalize(camera_position[None, :] - pts)
    H = _normalize(viewer_dirs + light_dirs)
    dot = lambda a, b: np.sum(a * b, axis=-1)
    # reference semantics (``render_st.py:219-226``): a back-facing
    # sqrt(negative) is deliberately left to produce NaN so nan_to_num
    # zeroes the specular term there — clamping the product to 0 instead
    # would send weight to +inf and the pixel to full specular
    with np.errstate(invalid="ignore", divide="ignore"):
        weight = 1.0 / (
            4.0 * np.pi * alpha1 * alpha2
            * np.sqrt(dot(normals, light_dirs) * dot(normals, viewer_dirs))
        )
        specular = weight * np.exp(
            -2.0 * ((dot(H, pc1) / alpha1) ** 2 + (dot(H, pc2) / alpha2) ** 2)
            / (1.0 + dot(normals, H))
        )
    specular = np.nan_to_num(specular)[:, None] * 0.1

    diffuse_c, spec_c, ambient_c = _colors(color_map, n)
    colors = np.ones_like(samples)
    colors[hits] = np.clip(
        diffuse_c * lambertian + spec_c * specular + ambient_c, 0.0, 0.9
    )
    return colors
