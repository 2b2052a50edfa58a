"""Extraction tests: marching tets properties, CAP & signed paths, cleanup."""

import numpy as np
import pytest

from diffudf_tpu.extract import (
    marching_tets_cells,
    extract_mesh_cap,
    extract_mesh_signed,
    clean_mesh,
    smooth_borders,
)
from diffudf_tpu.extract.postprocess import boundary_edges


def sphere_grid(N, r=0.6):
    axis = np.linspace(-1, 1, N)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    d = np.sqrt(x**2 + y**2 + z**2)
    return d - r  # signed, negative inside


class TestMarchingTets:
    def test_single_cell_plane(self):
        # plane z = 0.5 through one unit cell: corners below negative
        vals = np.array([[-0.5, -0.5, -0.5, -0.5, 0.5, 0.5, 0.5, 0.5]])
        origins = np.zeros((1, 3))
        verts, faces = marching_tets_cells(origins, vals)
        assert len(faces) > 0
        np.testing.assert_allclose(verts[:, 2], 0.5, atol=1e-12)
        # triangle normals point toward +z (positive side)
        for f in faces:
            n = np.cross(verts[f[1]] - verts[f[0]], verts[f[2]] - verts[f[0]])
            if np.linalg.norm(n) > 1e-12:
                assert n[2] > 0

    def test_no_crossing(self):
        vals = np.ones((3, 8))
        verts, faces = marching_tets_cells(np.zeros((3, 3)), vals)
        assert len(verts) == 0 and len(faces) == 0

    def test_watertight_sphere(self):
        sdf = sphere_grid(48)
        verts, faces = extract_mesh_signed(sdf)
        assert len(faces) > 100
        # closed surface: no boundary edges
        assert len(boundary_edges(faces)) == 0
        # all vertices on the r=0.6 sphere (within a voxel)
        r = np.linalg.norm(verts, axis=1)
        voxel = 2 / 47
        assert np.abs(r - 0.6).max() < voxel

    def test_orientation_outward(self):
        sdf = sphere_grid(32)
        verts, faces = extract_mesh_signed(sdf)
        n = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                     verts[faces[:, 2]] - verts[faces[:, 0]])
        centers = verts[faces].mean(axis=1)
        # positive side is outside ⇒ normals point away from origin
        dots = np.sum(n * centers, axis=1)
        assert (dots > 0).mean() > 0.99

    def test_euler_characteristic_sphere(self):
        sdf = sphere_grid(40)
        verts, faces = extract_mesh_signed(sdf)
        verts, faces = clean_mesh(verts, faces)
        e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
        e = np.unique(np.sort(e, axis=1), axis=0)
        euler = len(verts) - len(e) + len(faces)
        assert euler == 2  # topological sphere


class TestCap:
    def test_cap_sphere(self):
        N = 48
        sdf = sphere_grid(N)
        udf = np.abs(sdf)
        axis = np.linspace(-1, 1, N)
        x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
        p = np.stack([x, y, z], axis=-1)
        rn = np.linalg.norm(p, axis=-1, keepdims=True)
        outward = p / np.maximum(rn, 1e-9)
        # direction field points toward the surface: -sign(d)·outward
        dirs = -np.sign(sdf)[..., None] * outward
        verts, faces = extract_mesh_cap(udf, dirs, N, threshold=0.05)
        assert len(faces) > 100
        r = np.linalg.norm(verts, axis=1)
        assert np.abs(r - 0.6).max() < 2 * 2 / (N - 1)

    def test_cap_vote_signing_consistent_normals(self):
        """Vote signing must remove the anchor rule's per-cell normal
        flips: on a noisy-direction sphere every face normal points the
        same way relative to the surface."""
        rng = np.random.default_rng(7)
        N = 48
        sdf = sphere_grid(N)
        udf = np.abs(sdf)
        axis = np.linspace(-1, 1, N)
        x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
        p = np.stack([x, y, z], axis=-1)
        rn = np.linalg.norm(p, axis=-1, keepdims=True)
        outward = p / np.maximum(rn, 1e-9)
        dirs = -np.sign(sdf)[..., None] * outward
        # perturb directions like a learned field's noisy fringe
        dirs = dirs + 0.35 * rng.normal(size=dirs.shape)
        dirs /= np.maximum(np.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
        dirs = dirs.astype(np.float32)

        def orient_frac(signing):
            verts, faces = extract_mesh_cap(
                udf.astype(np.float32), dirs, N, threshold=0.05,
                signing=signing,
            )
            n = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                         verts[faces[:, 2]] - verts[faces[:, 0]])
            cen = verts[faces].mean(1)
            agree = (n * cen).sum(1) > 0
            return max(agree.mean(), 1 - agree.mean())

        assert orient_frac("vote") > 0.99
        # per-cell anchors flip under direction noise (the deficit fixed)
        assert orient_frac("vote") >= orient_frac("anchor")

    def test_cap_signing_validation(self):
        N = 16
        udf = np.full((N, N, N), 0.5, np.float32)
        dirs = np.zeros((N, N, N, 3), np.float32)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="Invalid signing"):
            extract_mesh_cap(udf, dirs, N, signing="bogus")

    def test_cap_empty_when_far(self):
        N = 16
        udf = np.full((N, N, N), 0.5, np.float32)
        dirs = np.zeros((N, N, N, 3), np.float32)
        dirs[..., 0] = 1
        verts, faces = extract_mesh_cap(udf, dirs, N)
        assert len(faces) == 0


class TestPostprocess:
    def test_clean_merges_duplicates(self):
        # two triangles sharing an edge but with duplicated vertices
        verts = np.array([
            [0, 0, 0], [1, 0, 0], [0, 1, 0],
            [1, 0, 0], [0, 1, 0], [1, 1, 0],
        ], dtype=np.float64)
        faces = np.array([[0, 1, 2], [3, 5, 4]])
        v2, f2 = clean_mesh(verts, faces, fill_holes=False)
        assert len(v2) == 4
        assert len(f2) == 2

    def test_clean_drops_degenerate(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float64)
        faces = np.array([[0, 1, 2], [0, 0, 1], [0, 1, 2]])
        v2, f2 = clean_mesh(verts, faces, fill_holes=False)
        assert len(f2) == 1

    def test_fill_triangle_hole(self):
        # tetrahedron missing one face -> hole of 3 boundary vertices
        verts = np.array([
            [0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]
        ], dtype=np.float64)
        faces = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2]])  # missing (1,2,3)
        v2, f2 = clean_mesh(verts, faces, fill_holes=True)
        assert len(f2) == 4
        assert len(boundary_edges(f2)) == 0

    def test_smooth_borders_moves_only_border(self):
        # open strip: 4 verts, 2 triangles; all vertices are on the border
        verts = np.array([
            [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0.5]
        ], dtype=np.float64)
        faces = np.array([[0, 1, 2], [1, 3, 2]])
        out = smooth_borders(verts, faces)
        assert out.shape == verts.shape
        assert np.isfinite(out).all()
        # smoothing pulls the lifted vertex toward its neighbours' plane
        assert out[3, 2] < verts[3, 2]


class TestOrientationAndComponents:
    def test_orient_faces_consistently(self):
        from diffudf_tpu.extract.postprocess import orient_faces_consistently

        # two triangles sharing edge (1,2) with INCONSISTENT winding
        faces = np.array([[0, 1, 2], [1, 2, 3]])  # both traverse 1->2
        out = orient_faces_consistently(faces)
        # after: the shared edge must be traversed in opposite directions
        e = np.concatenate([out[:, [0, 1]], out[:, [1, 2]], out[:, [2, 0]]])
        dirs = [tuple(x) for x in e]
        assert ((1, 2) in dirs) != ((1, 2) == tuple(e[3]))  # sanity
        assert (((1, 2) in dirs) and ((2, 1) in dirs))

    def test_orient_preserves_consistent(self):
        from diffudf_tpu.extract.postprocess import orient_faces_consistently

        sdf = sphere_grid(24)
        verts, faces = extract_mesh_signed(sdf)
        out = orient_faces_consistently(faces)
        # already consistent (signed MC): nothing should flip except possibly
        # a global component flip; same-direction duplicate edges stay zero
        e = np.concatenate([out[:, [0, 1]], out[:, [1, 2]], out[:, [2, 0]]])
        key = e[:, 0] * (out.max() + 1) + e[:, 1]
        _, counts = np.unique(key, axis=0, return_counts=True)
        assert (counts == 1).all()

    def test_remove_small_components(self):
        from diffudf_tpu.extract.postprocess import remove_small_components

        # big sphere + an isolated lone triangle far away
        sdf = sphere_grid(24)
        verts, faces = extract_mesh_signed(sdf)
        extra_v = np.array([[2.0, 2, 2], [2.1, 2, 2], [2, 2.1, 2]])
        v = np.concatenate([verts, extra_v])
        f = np.concatenate([faces, [[len(verts), len(verts) + 1, len(verts) + 2]]])
        v2, f2 = remove_small_components(v, f, min_faces=30)
        assert len(f2) == len(faces)
        assert len(v2) == len(verts)


class TestCleanupEdgeCases:
    def test_clean_mesh_all_degenerate(self):
        from diffudf_tpu.extract.postprocess import clean_mesh

        # every face degenerate -> must degrade to an empty mesh, not crash
        verts = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        faces = np.array([[0, 0, 1], [1, 1, 0]])
        v, f = clean_mesh(verts, faces)
        assert len(f) == 0

    def test_clean_mesh_duplicate_collapse_to_empty(self):
        from diffudf_tpu.extract.postprocess import clean_mesh

        # vertices that merge under the 1e-8 rounding key can degenerate a
        # face; cleanup must survive the collapse
        eps = 1e-12
        verts = np.array([[0.0, 0.0, 0.0], [eps, 0.0, 0.0], [0.0, eps, 0.0]])
        faces = np.array([[0, 1, 2]])
        v, f = clean_mesh(verts, faces)
        assert len(f) == 0
