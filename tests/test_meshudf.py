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

    def test_bfs_falls_back_to_mst_without_native(self, monkeypatch):
        """Default extraction must degrade gracefully on a g++-less box."""
        import sys

        import diffudf_tpu.native as native_pkg

        monkeypatch.delattr(native_pkg, "udf_mc", raising=False)
        monkeypatch.setitem(sys.modules, "diffudf_tpu.native.udf_mc", None)

        N = 32
        udf, dirs = sphere_udf(N)
        with pytest.warns(RuntimeWarning, match="falling back"):
            verts, faces = extract_mesh_meshudf(
                udf, dirs, signing="bfs", smooth_borders_enabled=False
            )
        assert len(faces) > 100
        r = np.linalg.norm(verts, axis=1)
        assert np.abs(r - 0.6).max() < 1.5 * (2 / (N - 1))


def patch_udf(N, half=0.5):
    """UDF of an open square patch z=0, |x|,|y| <= half — the open-sheet
    border case whose parity conflicts the BFS signing must suppress."""
    axis = np.linspace(-1, 1, N)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    ex = np.maximum(np.abs(x) - half, 0.0)
    ey = np.maximum(np.abs(y) - half, 0.0)
    udf = np.sqrt(ex**2 + ey**2 + z**2).astype(np.float32)
    # dirs = -grad(udf): closest point on the patch
    gx = np.sign(x) * ex
    gy = np.sign(y) * ey
    g = np.stack([gx, gy, z], axis=-1)
    g /= np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
    return udf, (-g).astype(np.float32)


class TestVoteBFS:
    """Reference-semantics native BFS signing (native.udf_mc.vote_bfs)."""

    def test_sphere_sign_agreement(self):
        N = 48
        udf, dirs = sphere_udf(N)
        from diffudf_tpu.native import udf_mc as native

        axis = np.linspace(-1, 1, N)
        x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
        rn = np.sqrt(x * x + y * y + z * z)
        true_sign = np.where(rn < 0.6, -1, 1)
        signs, emit = native.vote_bfs(udf, dirs, 2.0 / (N - 1))
        assert emit.sum() > 500
        m = signs != 0
        agree = (signs[m] == true_sign[m]).mean()
        assert max(agree, 1 - agree) > 0.999

    def test_sphere_extraction_quality(self):
        N = 48
        udf, dirs = sphere_udf(N)
        verts, faces = extract_mesh_meshudf(udf, dirs, signing="bfs")
        rad = np.linalg.norm(verts, axis=1)
        assert np.abs(rad - 0.6).max() < 0.1 * (2.0 / (N - 1))
        # closed surface: essentially no boundary edges
        assert len(boundary_edges(faces)) < 10

    def test_open_patch_no_spurious_sheets(self):
        N = 48
        udf, dirs = patch_udf(N)
        verts, faces = extract_mesh_meshudf(udf, dirs, signing="bfs",
                                            smooth_borders_enabled=False)
        # area should be about the patch area (1.0), not doubled/shredded
        tri = verts[faces]
        area = 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
        ).sum()
        assert 0.8 < area < 1.4
        # interior faces flat on z=0 with clean normals (the border keeps a
        # half-voxel skirt — the artifact the reference's border smoothing
        # targets, render_mc.py:169-197)
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
        interior = (np.abs(tri.mean(1)[:, :2]) < 0.4).all(axis=1)
        assert interior.sum() > 100
        assert np.mean(1 - np.abs(n[interior, 2])) < 1e-3
        assert np.abs(verts[:, 2]).max() < 0.6 * (2.0 / (N - 1))

    def test_invalid_signing(self):
        udf, dirs = sphere_udf(24)
        with pytest.raises(ValueError, match="Invalid signing"):
            extract_mesh_meshudf(udf, dirs, signing="bogus")

    def test_mst_path_still_works(self):
        udf, dirs = sphere_udf(32)
        verts, faces = extract_mesh_meshudf(udf, dirs, signing="mst")
        assert len(faces) > 100
