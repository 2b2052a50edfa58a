"""Voted-sign (MeshUDF-style) extraction tests on synthetic UDFs."""

import numpy as np
import pytest

from diffudf_tpu.extract.meshudf import (
    compute_signs,
    extract_mesh_meshudf,
    gate_cells,
    _signs_scipy,
)
from diffudf_tpu.extract.postprocess import boundary_edges


def sphere_udf(N, r=0.6):
    axis = np.linspace(-1, 1, N)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    p = np.stack([x, y, z], axis=-1)
    rn = np.linalg.norm(p, axis=-1)
    udf = np.abs(rn - r).astype(np.float32)
    outward = p / np.maximum(rn, 1e-9)[..., None]
    # direction field toward the surface
    dirs = (-np.sign(rn - r)[..., None] * outward).astype(np.float32)
    return udf, dirs


def plane_udf(N, z0=0.05):
    """Open-surface case a signed MC could never handle: a plane *sheet*
    through the volume described only by unsigned distance."""
    axis = np.linspace(-1, 1, N)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    udf = np.abs(z - z0).astype(np.float32)
    dirs = np.zeros((N, N, N, 3), np.float32)
    dirs[..., 2] = -np.sign(z - z0)
    return udf, dirs


class TestSignVoting:
    def test_sphere_signs_flip_across_surface(self):
        N = 32
        udf, dirs = sphere_udf(N)
        voxel = 2 / (N - 1)
        signs = compute_signs(udf, dirs, voxel)
        axis = np.linspace(-1, 1, N)
        x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
        rn = np.sqrt(x**2 + y**2 + z**2)
        near = udf < 2.0 * voxel  # compute_signs' default participation band
        inside = near & (rn < 0.6)
        outside = near & (rn > 0.6)
        # signs must separate the two sides (global flip is fine)
        s_in = signs[inside].astype(np.int32)
        s_out = signs[outside].astype(np.int32)
        assert abs(s_in.mean()) > 0.95
        assert abs(s_out.mean()) > 0.95
        assert np.sign(s_in.mean()) != np.sign(s_out.mean())

    def test_plane_sheet_signs(self):
        N = 24
        udf, dirs = plane_udf(N)
        voxel = 2 / (N - 1)
        signs = compute_signs(udf, dirs, voxel)
        axis = np.linspace(-1, 1, N)
        near = np.abs(axis[None, None, :] - 0.05) < 2.0 * voxel
        near = np.broadcast_to(near, (N, N, N))
        below = near & (axis[None, None, :] < 0.0)
        above = near & (axis[None, None, :] > 0.12)
        assert np.sign(signs[below].mean()) != np.sign(signs[above].mean())


class TestMeshUDFExtraction:
    def test_sphere_mesh(self):
        N = 48
        udf, dirs = sphere_udf(N)
        verts, faces = extract_mesh_meshudf(udf, dirs, smooth_borders_enabled=False)
        assert len(faces) > 100
        r = np.linalg.norm(verts, axis=1)
        voxel = 2 / (N - 1)
        assert np.abs(r - 0.6).max() < 1.5 * voxel
        # closed shape: no boundary edges after cleanup
        assert len(boundary_edges(faces)) == 0

    def test_open_sheet_mesh(self):
        # the raison d'être of UDF marching cubes: open surfaces
        N = 32
        udf, dirs = plane_udf(N)
        verts, faces = extract_mesh_meshudf(udf, dirs, smooth_borders_enabled=True)
        assert len(faces) > 50
        np.testing.assert_allclose(verts[:, 2], 0.05, atol=2 / (N - 1))
        # an open sheet HAS boundary edges
        assert len(boundary_edges(faces)) > 0

    def test_gates(self):
        N = 16
        udf = np.full((N, N, N), 1.0, np.float32)
        voxel = 2 / (N - 1)
        assert not gate_cells(udf, voxel).any()
        udf2 = np.zeros((N, N, N), np.float32)
        assert gate_cells(udf2, voxel).all()

    def test_raises_when_no_surface(self):
        N = 16
        udf = np.full((N, N, N), 1.0, np.float32)
        dirs = np.zeros((N, N, N, 3), np.float32)
        with pytest.raises(ValueError):
            extract_mesh_meshudf(udf, dirs)
