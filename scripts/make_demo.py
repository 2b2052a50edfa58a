#!/usr/bin/env python
"""Generate demo geometry (the repo's analogue of the reference's beetle).

Writes procedural meshes into data/demo/:
  * torus.obj       — a (0.6, 0.25) torus, the verify-skill workhorse
  * trefoil.obj     — a trefoil-knot tube, a harder genus-1 shape

plus garment-like OPEN sheets (the regime of the reference's published
DeepFashion / Multi-Garment tables, ``cuantitative.py:33-74`` — open
boundaries, no inside/outside, the case signed SDFs cannot represent):
  * cloth.obj       — a draped, wrinkled heightfield sheet
  * shell.obj       — an open hemispherical shell (bowl)
  * skirt.obj       — a flared open cone with azimuthal waves

Usage: python scripts/make_demo.py [out_dir]
Then:  python -m diffudf_tpu.cli.preprocess data/demo/torus.obj data/demo/
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from diffudf_tpu.data.mesh_io import Mesh, save_mesh  # noqa: E402


def grid_surface(fn, nu, nv, closed_u=True, closed_v=True):
    u = np.linspace(0, 2 * np.pi, nu, endpoint=not closed_u)
    v = np.linspace(0, 2 * np.pi, nv, endpoint=not closed_v)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    verts = fn(uu, vv).reshape(-1, 3)
    faces = []
    for i in range(nu if closed_u else nu - 1):
        for j in range(nv if closed_v else nv - 1):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces += [[a, b, c], [a, c, d]]
    return Mesh(verts, np.asarray(faces, np.int64))


def torus(R=0.6, r=0.25, nu=128, nv=64):
    def fn(u, v):
        x = (R + r * np.cos(v)) * np.cos(u)
        y = (R + r * np.cos(v)) * np.sin(u)
        z = r * np.sin(v)
        return np.stack([x, y, z], -1)

    return grid_surface(fn, nu, nv)


def trefoil(tube=0.18, nu=256, nv=48):
    def center(t):
        return np.stack(
            [
                np.sin(t) + 2 * np.sin(2 * t),
                np.cos(t) - 2 * np.cos(2 * t),
                -np.sin(3 * t),
            ],
            -1,
        ) / 3.5

    def fn(u, v):
        c = center(u)
        # frame via finite differences
        eps = 1e-4
        t_vec = (center(u + eps) - center(u - eps))
        t_vec /= np.linalg.norm(t_vec, axis=-1, keepdims=True)
        ref = np.broadcast_to(np.array([0.0, 0.0, 1.0]), t_vec.shape)
        n_vec = np.cross(t_vec, ref)
        # avoid degenerate frames where tangent ~ ref
        small = np.linalg.norm(n_vec, axis=-1, keepdims=True) < 1e-6
        alt = np.cross(t_vec, np.broadcast_to(np.array([0.0, 1.0, 0.0]), t_vec.shape))
        n_vec = np.where(small, alt, n_vec)
        n_vec /= np.linalg.norm(n_vec, axis=-1, keepdims=True)
        b_vec = np.cross(t_vec, n_vec)
        return c + tube * (np.cos(v)[..., None] * n_vec + np.sin(v)[..., None] * b_vec)

    return grid_surface(fn, nu, nv)


def cloth(n=192, size=0.85):
    """Draped-cloth heightfield: an open sheet with folds and wrinkles."""

    def fn(u, v):
        # map the [0, 2π) parameter range onto [-size, size]²
        x = (u / (2 * np.pi)) * 2 * size - size
        y = (v / (2 * np.pi)) * 2 * size - size
        drape = 0.35 * np.exp(-((x / 0.55) ** 2 + (y / 0.55) ** 2))
        folds = 0.10 * np.sin(4.0 * x) * np.cos(3.0 * y)
        wrinkle = 0.035 * np.sin(9.0 * (x + 0.6 * y))
        z = drape + folds + wrinkle - 0.25
        return np.stack([x, y, z], -1)

    return grid_surface(fn, n, n, closed_u=False, closed_v=False)


def shell(n_az=192, n_pol=96, r=0.7):
    """Open hemispherical shell (bowl), boundary at the equator."""

    def fn(u, v):
        # v ∈ [0, 2π) -> polar angle in [0.04π, 0.5π] (tiny pole hole
        # keeps the grid non-degenerate; garments have holes anyway)
        theta = 0.04 * np.pi + (v / (2 * np.pi)) * (0.46 * np.pi)
        x = r * np.sin(theta) * np.cos(u)
        y = r * np.sin(theta) * np.sin(u)
        z = r * np.cos(theta) - 0.15
        return np.stack([x, y, z], -1)

    return grid_surface(fn, n_az, n_pol, closed_u=True, closed_v=False)


def skirt(n_az=192, n_h=96):
    """Flared open cone (skirt-like) with azimuthal hem waves."""

    def fn(u, v):
        h = (v / (2 * np.pi)) * 1.2 - 0.6  # height in [-0.6, 0.6]
        flare = 0.32 + 0.28 * (0.6 - h) / 1.2
        wave = 0.05 * np.sin(5.0 * u) * (0.6 - h) / 1.2
        rr = flare + wave
        return np.stack([rr * np.cos(u), rr * np.sin(u), h], -1)

    return grid_surface(fn, n_az, n_h, closed_u=True, closed_v=False)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    out = argv[0] if argv else "data/demo"
    os.makedirs(out, exist_ok=True)
    names = []
    for name, mesh in (
        ("torus", torus()), ("trefoil", trefoil()),
        ("cloth", cloth()), ("shell", shell()), ("skirt", skirt()),
    ):
        save_mesh(os.path.join(out, f"{name}.obj"), mesh)
        names.append(name)
    print(f"wrote {', '.join(n + '.obj' for n in names)} to {out}/")


if __name__ == "__main__":
    main()
