"""Tests for mesh IO, normalization, distance oracles and the batch sampler."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffudf_tpu.data import (
    Mesh,
    PointCloudData,
    load_mesh,
    save_mesh,
    load_point_cloud,
    save_point_cloud,
    normalize_mesh,
    normalize_point_cloud,
    sample_surface_points,
    TrainingSampler,
    point_cloud_distance,
    point_triangle_distance,
    winding_number,
    signed_mesh_distance,
)
from diffudf_tpu.data.mesh_distance import triangles_from_mesh


def make_cube():
    """Unit cube [-0.5, 0.5]³ as a 12-triangle mesh with outward winding."""
    v = np.array(
        [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)],
        dtype=np.float64,
    )
    # faces with outward-facing orientation
    f = np.array([
        [0, 1, 3], [0, 3, 2],  # x = -0.5
        [4, 6, 7], [4, 7, 5],  # x = +0.5
        [0, 4, 5], [0, 5, 1],  # y = -0.5
        [2, 3, 7], [2, 7, 6],  # y = +0.5
        [0, 2, 6], [0, 6, 4],  # z = -0.5
        [1, 5, 7], [1, 7, 3],  # z = +0.5
    ], dtype=np.int64)
    return Mesh(v, f)


class TestIO:
    def test_obj_roundtrip(self, tmp_path):
        m = make_cube()
        p = str(tmp_path / "cube.obj")
        save_mesh(p, m)
        m2 = load_mesh(p)
        np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-6)
        np.testing.assert_array_equal(m2.faces, m.faces)

    def test_ply_mesh_roundtrip(self, tmp_path):
        m = make_cube()
        p = str(tmp_path / "cube.ply")
        save_mesh(p, m)
        m2 = load_mesh(p)
        np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-6)
        np.testing.assert_array_equal(m2.faces, m.faces)

    def test_ply_points_roundtrip(self, tmp_path, rng):
        pts = rng.normal(size=(100, 3))
        nrm = rng.normal(size=(100, 3))
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        p = str(tmp_path / "pc.ply")
        save_point_cloud(p, PointCloudData(pts, nrm))
        pc = load_point_cloud(p)
        np.testing.assert_allclose(pc.points, pts, atol=1e-6)
        np.testing.assert_allclose(pc.normals, nrm, atol=1e-6)

    def test_obj_quad_triangulation(self, tmp_path):
        p = str(tmp_path / "quad.obj")
        with open(p, "w") as fh:
            fh.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        m = load_mesh(p)
        assert m.faces.shape == (2, 3)

    def test_vertex_normals(self):
        m = make_cube()
        vn = m.compute_vertex_normals()
        assert vn.shape == (8, 3)
        # corner normals of a cube point diagonally outward
        assert np.all(np.sign(vn) == np.sign(m.vertices))


class TestNormalize:
    def test_mesh_in_cube_with_margin(self, rng):
        v = rng.normal(size=(50, 3)) * 4 + np.array([10.0, -3.0, 7.0])
        m = Mesh(v, np.zeros((0, 3), np.int64))
        m2, T = normalize_mesh(m)
        assert np.abs(m2.vertices).max() == pytest.approx(1 / 1.1, rel=1e-6)
        np.testing.assert_allclose(m2.center, 0.0, atol=1e-9)
        # transform reproduces the normalized vertices
        v2 = v @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(v2, m2.vertices, atol=1e-12)

    def test_point_cloud(self, rng):
        pts = rng.normal(size=(100, 3)) * 3 + 5
        pc, T = normalize_point_cloud(PointCloudData(pts, None))
        assert np.abs(pc.points).max() == pytest.approx(1 / 1.1, rel=1e-6)


class TestDistances:
    def test_point_cloud_distance_vs_numpy(self, rng):
        cloud = rng.normal(size=(500, 3)).astype(np.float32)
        q = rng.normal(size=(64, 3)).astype(np.float32)
        got = np.asarray(point_cloud_distance(jnp.asarray(q), jnp.asarray(cloud)))
        want = np.sqrt(((q[:, None] - cloud[None]) ** 2).sum(-1)).min(1)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_point_cloud_distance_tiled(self, rng):
        cloud = rng.normal(size=(300, 3)).astype(np.float32)
        q = rng.normal(size=(5000, 3)).astype(np.float32)
        got = np.asarray(point_cloud_distance(jnp.asarray(q), jnp.asarray(cloud), tile=1024))
        want = np.sqrt(((q[:, None] - cloud[None]) ** 2).sum(-1)).min(1)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_point_triangle_distance_cube(self, rng):
        m = make_cube()
        tris = triangles_from_mesh(m.vertices, m.faces)
        # for a cube, distance from outside points = distance to the box
        q = np.array([
            [1.0, 0.0, 0.0],   # 0.5 from +x face
            [0.0, 0.0, 2.0],   # 1.5 from +z face
            [0.7, 0.7, 0.0],   # sqrt(2)*0.2 from the edge
            [0.0, 0.0, 0.0],   # center: 0.5 from every face
        ], dtype=np.float32)
        want = np.array([0.5, 1.5, np.sqrt(2) * 0.2, 0.5])
        got = np.asarray(point_triangle_distance(jnp.asarray(q), tris))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_winding_number_cube(self, rng):
        m = make_cube()
        tris = triangles_from_mesh(m.vertices, m.faces)
        inside = (rng.random((50, 3)).astype(np.float32) - 0.5) * 0.9
        outside = rng.normal(size=(50, 3)).astype(np.float32)
        outside = outside / np.linalg.norm(outside, axis=1, keepdims=True) * 2.0
        w_in = np.asarray(winding_number(jnp.asarray(inside), tris))
        w_out = np.asarray(winding_number(jnp.asarray(outside), tris))
        np.testing.assert_allclose(w_in, 1.0, atol=1e-3)
        np.testing.assert_allclose(w_out, 0.0, atol=1e-3)

    def test_signed_distance_cube(self):
        m = make_cube()
        tris = triangles_from_mesh(m.vertices, m.faces)
        q = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]], dtype=jnp.float32)
        d = np.asarray(signed_mesh_distance(q, tris))
        np.testing.assert_allclose(d, [-0.5, 0.5], atol=1e-5)

    def test_pruned_distance_matches_brute_force(self, rng):
        from diffudf_tpu.data.mesh_distance import (
            point_triangle_distance_pruned,
        )

        # random fine triangle soup (many small triangles — the regime the
        # training oracle sees after preprocessing)
        base = rng.uniform(-1, 1, size=(600, 3)).astype(np.float32)
        e1 = rng.normal(size=(600, 3)).astype(np.float32) * 0.05
        e2 = rng.normal(size=(600, 3)).astype(np.float32) * 0.05
        tris = jnp.asarray(np.stack([base, base + e1, base + e2], axis=1))
        q = rng.uniform(-1.2, 1.2, size=(700, 3)).astype(np.float32)
        brute = np.asarray(point_triangle_distance(jnp.asarray(q), tris))
        pruned = np.asarray(
            point_triangle_distance_pruned(jnp.asarray(q), tris, k=64, tile=256)
        )
        np.testing.assert_allclose(pruned, brute, atol=1e-5)

    def test_pruned_distance_small_soup_exact_path(self, rng):
        from diffudf_tpu.data.mesh_distance import (
            point_triangle_distance_pruned,
        )

        m = make_cube()
        tris = triangles_from_mesh(m.vertices, m.faces)  # 12 < k
        q = rng.uniform(-1, 1, size=(40, 3)).astype(np.float32)
        brute = np.asarray(point_triangle_distance(jnp.asarray(q), tris))
        pruned = np.asarray(point_triangle_distance_pruned(jnp.asarray(q), tris))
        np.testing.assert_allclose(pruned, brute, atol=1e-6)

    def test_candidate_grid_matches_brute_force(self, rng):
        """The per-step training oracle: precomputed per-cell candidates +
        flat exact test must reproduce the brute force on a fine soup."""
        from diffudf_tpu.data.mesh_distance import (
            build_candidate_grid,
            point_triangle_distance_cells,
        )

        base = rng.uniform(-0.9, 0.9, size=(2000, 3)).astype(np.float32)
        e1 = rng.normal(size=(2000, 3)).astype(np.float32) * 0.03
        e2 = rng.normal(size=(2000, 3)).astype(np.float32) * 0.03
        tris = jnp.asarray(np.stack([base, base + e1, base + e2], axis=1))
        cand = build_candidate_grid(tris)
        q = rng.uniform(-1.05, 1.05, size=(3000, 3)).astype(np.float32)
        brute = np.asarray(point_triangle_distance(jnp.asarray(q), tris))
        got = np.asarray(point_triangle_distance_cells(jnp.asarray(q), tris, cand))
        np.testing.assert_allclose(got, brute, atol=1e-5)

    def test_candidate_grid_exact_on_surface_mesh(self, rng):
        """Same check on a structured surface mesh (torus shell) with
        training-like query mix: uniform far + near-surface offsets."""
        from diffudf_tpu.data.mesh_distance import (
            build_candidate_grid,
            point_triangle_distance_cells,
        )

        nu, nv = 96, 48
        u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
        v = np.linspace(0, 2 * np.pi, nv, endpoint=False)
        uu, vv = np.meshgrid(u, v, indexing="ij")
        verts = np.stack([
            (0.6 + 0.25 * np.cos(vv)) * np.cos(uu),
            (0.6 + 0.25 * np.cos(vv)) * np.sin(uu),
            0.25 * np.sin(vv),
        ], -1).reshape(-1, 3)
        faces = []
        for i in range(nu):
            for j in range(nv):
                a = i * nv + j
                b = ((i + 1) % nu) * nv + j
                c = ((i + 1) % nu) * nv + (j + 1) % nv
                d = i * nv + (j + 1) % nv
                faces += [[a, b, c], [a, c, d]]
        tris = jnp.asarray(verts[np.asarray(faces)], jnp.float32)
        cand = build_candidate_grid(tris)

        far = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
        idx = rng.integers(0, len(verts), 2000)
        near = (verts[idx] + 0.01 * rng.normal(size=(2000, 3))).astype(np.float32)
        q = np.concatenate([far, near])
        brute = np.asarray(point_triangle_distance(jnp.asarray(q), tris))
        got = np.asarray(point_triangle_distance_cells(jnp.asarray(q), tris, cand))
        np.testing.assert_allclose(got, brute, atol=1e-5)


    def test_candidate_grid_nonuniform_triangle_sizes(self, rng):
        """Coverage regression: a huge triangle whose CENTROID is far from
        a cell must still be that cell's candidate when its SURFACE passes
        nearby.  A dense cluster of >k tiny triangles next to a ground
        plane used to crowd the plane out of the nearest-centroid
        over-query, silently corrupting mesh-mode training GT."""
        from diffudf_tpu.data.mesh_distance import (
            build_candidate_grid,
            point_triangle_distance_cells,
        )

        # ground plane z = -0.5 as two domain-spanning triangles
        quad = np.array(
            [[-1, -1, -0.5], [1, -1, -0.5], [1, 1, -0.5], [-1, 1, -0.5]],
            np.float32,
        )
        plane = np.stack([quad[[0, 1, 2]], quad[[0, 2, 3]]])
        # 5000 tiny triangles clustered just above the plane
        base = (
            np.array([0.5, 0.5, -0.45], np.float32)
            + rng.normal(size=(5000, 3)).astype(np.float32) * 0.01
        )
        e1 = rng.normal(size=(5000, 3)).astype(np.float32) * 0.005
        e2 = rng.normal(size=(5000, 3)).astype(np.float32) * 0.005
        cluster = np.stack([base, base + e1, base + e2], axis=1)
        tris = jnp.asarray(np.concatenate([plane, cluster]))

        cand = build_candidate_grid(tris)
        # queries hugging the plane far from both centroids AND the cluster
        px = rng.uniform(-0.95, 0.95, size=(500, 2)).astype(np.float32)
        qz = (-0.5 + rng.uniform(-0.04, 0.04, size=(500, 1))).astype(np.float32)
        q = np.concatenate([px, qz], axis=1)
        brute = np.asarray(point_triangle_distance(jnp.asarray(q), tris))
        got = np.asarray(point_triangle_distance_cells(jnp.asarray(q), tris, cand))
        np.testing.assert_allclose(got, brute, atol=1e-5)

    def test_point_candidate_grid_matches_kdtree(self, rng):
        """The pc-mode per-step oracle: per-cell point table + flat exact
        sweep must reproduce the true nearest-neighbour distance on a
        surface cloud with training-like queries (exact on near rows,
        sub-mm on uniform far rows)."""
        from diffudf_tpu.data.mesh_distance import (
            build_point_candidate_grid,
            point_cloud_distance_cells,
        )
        from scipy.spatial import cKDTree

        u = rng.normal(size=(20000, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        cloud = (u * 0.7).astype(np.float32)
        table = build_point_candidate_grid(cloud)
        assert table.shape[1:] == (64, 3)

        far = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
        idx = rng.integers(0, len(cloud), 2000)
        near = (cloud[idx] + 0.01 * rng.normal(size=(2000, 3))).astype(np.float32)
        q = np.concatenate([far, near])
        got = np.asarray(point_cloud_distance_cells(jnp.asarray(q), table))
        want, _ = cKDTree(cloud).query(q)
        # near rows exact; far rows exact-on-candidates (≲ few mm worst case)
        np.testing.assert_allclose(got[2000:], want[2000:], atol=1e-5)
        np.testing.assert_allclose(got[:2000], want[:2000], atol=5e-3)
        assert np.abs(got[:2000] - want[:2000]).mean() < 1e-4

    def test_point_candidate_grid_tiny_cloud(self, rng):
        """Clouds smaller than k keep the compile-stable table width."""
        from diffudf_tpu.data.mesh_distance import (
            build_point_candidate_grid,
            point_cloud_distance_cells,
        )

        cloud = rng.normal(size=(10, 3)).astype(np.float32) * 0.5
        table = build_point_candidate_grid(cloud)
        assert table.shape[1:] == (64, 3)
        q = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
        got = np.asarray(point_cloud_distance_cells(jnp.asarray(q), table))
        want = np.sqrt(((q[:, None] - cloud[None]) ** 2).sum(-1)).min(1)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestSampling:
    def test_surface_sampling_on_cube(self):
        m = make_cube()
        pts, nrm = sample_surface_points(m, 2000, seed=1)
        assert pts.shape == (2000, 3)
        # all points on the cube surface: max |coord| == 0.5
        np.testing.assert_allclose(np.abs(pts).max(axis=1), 0.5, atol=1e-9)
        # normals are axis-aligned unit vectors
        np.testing.assert_allclose(np.abs(nrm).sum(axis=1), 1.0, atol=1e-9)

    def test_pc_sampler_batch(self, rng):
        pts = rng.normal(size=(1000, 3)).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)  # unit sphere
        nrm = pts.copy()
        sampler = TrainingSampler.from_point_cloud(pts, nrm, 300, [0.333, 0.666])
        p, n, s = jax.jit(sampler.sample)(jax.random.PRNGKey(0))
        sz = sampler.static.sizes
        assert p.shape == (sz.total, 3)
        assert n.shape == (sz.total, 3)
        assert s.shape == (sz.total, 1)
        s = np.asarray(s)[:, 0]
        # on-surface rows have sdf exactly 0, normals nonzero
        assert np.all(s[: sz.on_surface] == 0)
        assert np.all(np.abs(np.asarray(n)[: sz.on_surface]).sum(1) > 0.5)
        # far rows: distance to unit sphere cloud ≈ | |p| - 1 | (dense cloud)
        far = np.asarray(p)[sz.on_surface : sz.on_surface + sz.far]
        want = np.abs(np.linalg.norm(far, axis=1) - 1.0)
        got = s[sz.on_surface : sz.on_surface + sz.far]
        # cloud distance ≥ analytic sphere distance, and within cloud spacing
        assert np.all(got >= want - 1e-5)
        assert np.all(got <= want + 0.2)
        # near rows: small positive offsets
        near_s = s[sz.on_surface + sz.far :]
        assert np.all(near_s >= 0)
        assert near_s.max() < 0.08  # ~N(0, 0.01) magnitudes

    def test_mesh_sampler_unsigned_exact(self, rng):
        """Mesh-mode GT is the exact *unsigned* mesh distance (documented
        deviation from the reference's signed Open3D oracle — every
        shipping loss is even in the GT distance, see
        ``TrainingSampler.sample``)."""
        m = make_cube()
        pts, nrm = sample_surface_points(m, 500, seed=2)
        tris = np.asarray(m.vertices[m.faces])
        sampler = TrainingSampler.from_mesh(pts, nrm, tris, 300, [0.333, 0.666])
        p, n, s = jax.jit(sampler.sample)(jax.random.PRNGKey(1))
        sz = sampler.static.sizes
        s = np.asarray(s)[:, 0]
        far_sl = slice(sz.on_surface, sz.on_surface + sz.far)
        far = np.asarray(p)[far_sl]
        assert np.all(s >= 0)
        # |distance to box| for interior+exterior points of the 0.5-cube
        box = np.maximum(np.abs(far) - 0.5, 0.0)
        outside_d = np.sqrt((box**2).sum(axis=1))
        inside_d = np.maximum(0.5 - np.abs(far), 0.0).min(axis=1)
        want = np.where(outside_d > 0, outside_d, inside_d)
        np.testing.assert_allclose(s[far_sl], want, atol=1e-5)

    def test_mesh_sampler_triangle_padding_buckets(self):
        m = make_cube()
        pts, nrm = sample_surface_points(m, 100, seed=2)
        tris = np.asarray(m.vertices[m.faces])  # 12 triangles
        sampler = TrainingSampler.from_mesh(
            pts, nrm, tris, 30, [0.333, 0.666], oracle_layout="indices"
        )
        # padded to the fixed compile-sharing bucket with far degenerates
        assert sampler.tri_verts.shape[0] == TrainingSampler.TRI_PAD_BUCKET
        # candidates index only the 12 REAL triangles, repeated to the
        # fixed k width (padded degenerates are never candidates)
        assert sampler.tri_candidates.shape[1] == 96
        assert int(np.asarray(sampler.tri_candidates).max()) < 12

    def test_mesh_sampler_table_layout_matches_indices(self):
        """The default coordinate-table oracle returns the same GT
        distances as the scattered-indices layout (same candidate sets,
        different HBM access pattern), and its table shape is
        mesh-independent (compile sharing without triangle padding)."""
        from diffudf_tpu.data.mesh_distance import CAND_GRID_G, CAND_GRID_K

        m = make_cube()
        pts, nrm = sample_surface_points(m, 100, seed=2)
        tris = np.asarray(m.vertices[m.faces])
        s_tab = TrainingSampler.from_mesh(pts, nrm, tris, 60, [0.333, 0.666])
        s_idx = TrainingSampler.from_mesh(
            pts, nrm, tris, 60, [0.333, 0.666], oracle_layout="indices"
        )
        assert s_tab.tri_table.shape == (CAND_GRID_G**3, CAND_GRID_K * 9)
        assert s_tab.tri_verts is None and s_tab.tri_candidates is None
        key = jax.random.PRNGKey(3)
        p_t, n_t, d_t = jax.jit(s_tab.sample)(key)
        p_i, n_i, d_i = jax.jit(s_idx.sample)(key)
        np.testing.assert_array_equal(np.asarray(p_t), np.asarray(p_i))
        np.testing.assert_allclose(
            np.asarray(d_t), np.asarray(d_i), atol=1e-6
        )

    def test_batch_sizes_match_reference_split(self):
        from diffudf_tpu.data.sampling import BatchSizes

        sz = BatchSizes.from_config(30000, [0.333, 0.666])
        assert sz.on_surface == 9990
        assert sz.far == 9990
        assert sz.near == 9990


class TestOracleCache:
    """Disk cache for the one-shot candidate-grid builds
    (``data/oracle_cache.py``): content-hashed, shared npz, best-effort."""

    def _soup(self, rng, n=400):
        base = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
        e1 = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
        e2 = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
        return np.stack([base, base + e1, base + e2], axis=1)

    def test_mesh_cache_roundtrip_and_hit(self, rng, tmp_path, monkeypatch):
        from diffudf_tpu.data import oracle_cache as oc

        tris = self._soup(rng)
        path = str(tmp_path / "shape_oracle_cache.npz")
        cand1 = np.asarray(oc.cached_candidate_grid(tris, path))
        # per-field file layout (concurrent-writer safe, round 5)
        assert (tmp_path / "shape_oracle_cache.npz.tri_cand.npz").exists()
        # second call must LOAD, not rebuild
        monkeypatch.setattr(
            oc.md, "build_candidate_grid",
            lambda *a, **k: (_ for _ in ()).throw(AssertionError("rebuilt")),
        )
        cand2 = np.asarray(oc.cached_candidate_grid(tris, path))
        np.testing.assert_array_equal(cand1, cand2)

    def test_mesh_cache_reads_legacy_merged_file(self, rng, tmp_path,
                                                 monkeypatch):
        """Round-4 merged-npz caches stay readable (migration path)."""
        from diffudf_tpu.data import oracle_cache as oc

        tris = self._soup(rng)
        path = str(tmp_path / "legacy.npz")
        cand = oc.cached_candidate_grid_host(tris, None)
        key = oc._key("tri", np.asarray(tris, np.float32),
                      oc.md.CAND_GRID_G, oc.md.CAND_GRID_K,
                      oc.md.CAND_GRID_LO, oc.md.CAND_GRID_HI)
        np.savez(path, tri_cand=cand, tri_cand_key=np.asarray(key))
        monkeypatch.setattr(
            oc.md, "build_candidate_grid",
            lambda *a, **k: (_ for _ in ()).throw(AssertionError("rebuilt")),
        )
        got = oc.cached_candidate_grid_host(tris, path)
        np.testing.assert_array_equal(got, cand)

    def test_mesh_cache_stale_on_changed_geometry(self, rng, tmp_path):
        from diffudf_tpu.data import oracle_cache as oc
        from diffudf_tpu.data.mesh_distance import build_candidate_grid

        tris = self._soup(rng)
        path = str(tmp_path / "c.npz")
        oc.cached_candidate_grid(tris, path)
        moved = tris + np.float32(0.05)
        got = np.asarray(oc.cached_candidate_grid(moved, path))
        want = np.asarray(build_candidate_grid(jnp.asarray(moved)))
        np.testing.assert_array_equal(got, want)

    def test_pc_cache_matches_direct_build(self, rng, tmp_path, monkeypatch):
        from diffudf_tpu.data import oracle_cache as oc
        from diffudf_tpu.data.mesh_distance import build_point_candidate_grid

        u = rng.normal(size=(3000, 3))
        cloud = (u / np.linalg.norm(u, axis=1, keepdims=True) * 0.7).astype(
            np.float32
        )
        path = str(tmp_path / "c.npz")
        t1 = np.asarray(oc.cached_point_candidate_grid(cloud, path))
        want = np.asarray(build_point_candidate_grid(cloud))
        np.testing.assert_array_equal(t1, want)
        # hit path: identical table without touching the tree
        import scipy.spatial

        monkeypatch.setattr(
            scipy.spatial, "cKDTree",
            lambda *a, **k: (_ for _ in ()).throw(AssertionError("rebuilt")),
        )
        t2 = np.asarray(oc.cached_point_candidate_grid(cloud, path))
        np.testing.assert_array_equal(t1, t2)

    def test_shared_file_holds_both_oracles(self, rng, tmp_path):
        from diffudf_tpu.data import oracle_cache as oc

        tris = self._soup(rng, 100)
        cloud = rng.normal(size=(500, 3)).astype(np.float32) * 0.5
        path = str(tmp_path / "both.npz")
        c1 = np.asarray(oc.cached_candidate_grid(tris, path))
        t1 = np.asarray(oc.cached_point_candidate_grid(cloud, path))
        # the second store must not evict the first field
        c2 = np.asarray(oc.cached_candidate_grid(tris, path))
        t2 = np.asarray(oc.cached_point_candidate_grid(cloud, path))
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(t1, t2)

    def test_corrupt_cache_warns_and_rebuilds(self, rng, tmp_path):
        import warnings as _w

        from diffudf_tpu.data import oracle_cache as oc
        from diffudf_tpu.data.mesh_distance import build_candidate_grid

        tris = self._soup(rng, 100)
        path = str(tmp_path / "c.npz")
        with open(path, "wb") as fh:
            fh.write(b"not an npz")
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            got = np.asarray(oc.cached_candidate_grid(tris, path))
        assert any("rebuilding" in str(r.message) for r in rec)
        want = np.asarray(build_candidate_grid(jnp.asarray(tris)))
        np.testing.assert_array_equal(got, want)
        # and the rebuild repaired the file in place
        got2 = np.asarray(oc.cached_candidate_grid(tris, path))
        np.testing.assert_array_equal(got2, want)

    def test_sampler_with_cache_path_is_equivalent(self, rng, tmp_path):
        m = make_cube()
        pts, nrm = sample_surface_points(m, 100, seed=2)
        tris = np.asarray(m.vertices[m.faces])
        plain = TrainingSampler.from_mesh(pts, nrm, tris, 60, [0.333, 0.666])
        cached = TrainingSampler.from_mesh(
            pts, nrm, tris, 60, [0.333, 0.666],
            cache_path=str(tmp_path / "cube.npz"),
        )
        np.testing.assert_array_equal(
            np.asarray(plain.tri_table), np.asarray(cached.tri_table)
        )
