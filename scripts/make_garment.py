#!/usr/bin/env python
"""Generate a garment-class stress asset (≥100k faces).

The reference's published tables are DeepFashion / Multi-Garment
(``cuantitative.py:33-59``, ``README.md:130-134``): high-poly OPEN
garments.  The committed demo sweep covers that *regime* (open sheets)
but at 16k–73k faces; this script produces a dress-like surface whose
triangle count matches the garment-class scale so the mesh-mode GT
oracle (``data/mesh_distance.build_candidate_grid``) and the full
pipeline are exercised at ≥100k faces:

  * ``garment.obj``  — 512×168 grid → **171,008 faces**: flared dress
    with pleats, hem waves and fine wrinkles (the high-frequency detail
    only exists at this resolution — the faces carry real geometry, not
    subdivision padding).

Usage: python scripts/make_garment.py [out_dir] [--n-az 512] [--n-h 168]
Then:  python -m diffudf_tpu.cli.preprocess data/garment/garment.obj data/garment/ -s 100000

The asset is NOT committed (≈14 MB OBJ); regenerate with this script
(deterministic, no RNG).
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from make_demo import grid_surface  # noqa: E402

from diffudf_tpu.data.mesh_io import save_mesh  # noqa: E402


def garment(n_az=512, n_h=168):
    """Flared open dress: pleats + hem waves + fine wrinkles."""

    def fn(u, v):
        h = (v / (2 * np.pi)) * 1.3 - 0.65         # height in [-0.65, 0.65]
        t = (0.65 - h) / 1.3                        # 0 at waist, 1 at hem
        flare = 0.28 + 0.34 * t ** 1.3              # dress silhouette
        pleats = 0.035 * np.sin(24.0 * u) * t       # broad pleats
        wave = 0.05 * np.sin(5.0 * u + 2.0 * t) * t  # hem waves (skirt-like)
        wrinkle = 0.012 * np.sin(60.0 * u + 8.0 * h) * t ** 2  # fine cloth wrinkles
        rr = flare + pleats + wave + wrinkle
        return np.stack([rr * np.cos(u), rr * np.sin(u), h], -1)

    return grid_surface(fn, n_az, n_h, closed_u=True, closed_v=False)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("out", nargs="?", default="data/garment")
    p.add_argument("--n-az", type=int, default=512)
    p.add_argument("--n-h", type=int, default=168)
    p.add_argument("--name", default="garment")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    mesh = garment(args.n_az, args.n_h)
    path = osp.join(args.out, f"{args.name}.obj")
    save_mesh(path, mesh)
    print(f"wrote {path}: {len(mesh.vertices)} verts, {len(mesh.faces)} faces")


if __name__ == "__main__":
    main()
