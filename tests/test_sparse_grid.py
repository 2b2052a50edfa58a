"""Hierarchical (sparse) grid extraction vs the dense reference path.

The sparse path (``grid.lattice.extract_fields_sparse``) must be *exact*
wherever any downstream consumer reads values: the signing band (2 voxels),
the MeshUDF cell gates (1.75 voxels max-corner), CAP's min-corner gate, and
the direction field inside the dirs band.  These tests compare against the
dense pass on a fitted field and check the extracted meshes agree.
"""

import numpy as np
import pytest

from diffudf_tpu.grid.lattice import extract_fields, extract_fields_sparse


@pytest.fixture(scope="module")
def fields_pair(trained_sphere):
    params, spec, r, alpha = trained_sphere
    N = 49  # N-1 = 48: stride 6 applies
    dense = extract_fields(params, spec, N, "tanh", alpha)
    udf_d = np.asarray(dense[0])
    dirs_d = np.asarray(dense[1])
    udf_s, dirs_s = extract_fields_sparse(params, spec, N, "tanh", alpha)
    return N, udf_d, dirs_d, udf_s, dirs_s


class TestSparseFields:
    def test_exact_inside_band(self, fields_pair):
        N, udf_d, dirs_d, udf_s, dirs_s = fields_pair
        h = 2.0 / (N - 1)
        band = udf_d <= 3.0 * h  # strictest consumer reach is < 3 voxels
        assert band.any()
        # value-only vs fused forward differ by float reassociation (~1e-5,
        # amplified by the sqrt in inverse_map); gates are multiples of h
        np.testing.assert_allclose(udf_s[band], udf_d[band], rtol=0, atol=1e-4)

    def test_background_above_every_gate(self, fields_pair):
        N, udf_d, dirs_d, udf_s, dirs_s = fields_pair
        h = 2.0 / (N - 1)
        approx = np.abs(udf_s - udf_d) > 1e-4
        # any vertex that got the background must be outside all gates
        assert (udf_s[approx] > 2.75 * h).all()
        # and must really be far: the dense value there exceeds the band too
        assert (udf_d[approx] > 3.0 * h).all()

    def test_dirs_match_in_dirs_band(self, fields_pair):
        N, udf_d, dirs_d, udf_s, dirs_s = fields_pair
        h = 2.0 / (N - 1)
        band = udf_d <= 2.75 * h
        # both run direction_field on the same points; the default bf16
        # derivative carries add ~0.4% per-run noise, so compare by angle
        cos = np.sum(dirs_s[band] * dirs_d[band], axis=-1)
        assert np.quantile(cos, 0.001) > 0.99
        assert np.median(cos) > 0.9999

    def test_custom_cap_threshold_widens_band(self, trained_sphere):
        """CAP's vote signing reads dirs out to ``threshold + 2h``; with a
        custom (large) CAP threshold the sparse band must widen to cover
        it — the band used to hardcode 0.008 and clip the vote fringe."""
        params, spec, r, alpha = trained_sphere
        N = 49
        thr = 0.15  # ≫ default 0.008 and ≫ 3.5 voxels at N=49
        udf_d, dirs_d = (np.asarray(a) for a in
                         extract_fields(params, spec, N, "tanh", alpha))
        udf_s, dirs_s = extract_fields_sparse(
            params, spec, N, "tanh", alpha, cap_threshold=thr
        )
        h = 2.0 / (N - 1)
        band = udf_d <= thr + 2.0 * h
        assert band.sum() > 1000
        np.testing.assert_allclose(udf_s[band], udf_d[band], rtol=0, atol=1e-4)
        cos = np.sum(dirs_s[band] * dirs_d[band], axis=-1)
        assert np.quantile(cos, 0.001) > 0.99

    def test_dirs_exact_with_f32_derivatives(self, trained_sphere):
        import jax.numpy as jnp

        params, spec, r, alpha = trained_sphere
        N = 25  # N-1 = 24: stride 3
        dense = extract_fields(params, spec, N, "tanh", alpha,
                               deriv_dtype=jnp.float32)
        dirs_d = np.asarray(dense[1])
        udf_d = np.asarray(dense[0])
        _, dirs_s = extract_fields_sparse(params, spec, N, "tanh", alpha,
                                          deriv_dtype=jnp.float32)
        h = 2.0 / (N - 1)
        band = udf_d <= 2.75 * h
        assert band.any()
        np.testing.assert_allclose(dirs_s[band], dirs_d[band], atol=1e-3)

    def _masked_like_sparse(self, N, udf_d, dirs_d):
        """Apply the sparse path's banding to the *dense* values: in-band
        values identical, background/zero fill outside.  Isolates the claim
        "consumers never read outside the band" from float noise between
        the value-only and fused forward passes (covered separately)."""
        h = 2.0 / (N - 1)
        bg = np.float32(20.0 * h)
        udf_m = np.where(udf_d <= 4.0 * h, udf_d, bg).astype(np.float32)
        dirs_m = np.where(
            (udf_d <= 3.5 * h)[..., None], dirs_d, 0.0
        ).astype(np.float32)
        return udf_m, dirs_m

    def test_meshudf_insensitive_outside_band(self, fields_pair):
        from diffudf_tpu.extract.meshudf import extract_mesh_meshudf

        N, udf_d, dirs_d, udf_s, dirs_s = fields_pair
        udf_m, dirs_m = self._masked_like_sparse(N, udf_d, dirs_d)
        vd, fd = extract_mesh_meshudf(udf_d, dirs_d)
        vm, fm = extract_mesh_meshudf(udf_m, dirs_m)
        assert fm.shape == fd.shape
        np.testing.assert_allclose(vm, vd, atol=1e-6)

    def test_cap_insensitive_outside_band(self, fields_pair):
        from diffudf_tpu.extract.cap import extract_mesh_cap

        N, udf_d, dirs_d, udf_s, dirs_s = fields_pair
        udf_m, dirs_m = self._masked_like_sparse(N, udf_d, dirs_d)
        vd, fd = extract_mesh_cap(udf_d, dirs_d, N)
        vm, fm = extract_mesh_cap(udf_m, dirs_m, N)
        assert fm.shape == fd.shape
        np.testing.assert_allclose(vm, vd, atol=1e-6)

    def test_sparse_meshudf_close_to_dense(self, fields_pair):
        """End-to-end: the real sparse fields produce essentially the same
        mesh (vertex sets within a small fraction of a voxel)."""
        from diffudf_tpu.extract.meshudf import extract_mesh_meshudf

        N, udf_d, dirs_d, udf_s, dirs_s = fields_pair
        h = 2.0 / (N - 1)
        vd, fd = extract_mesh_meshudf(udf_d, dirs_d)
        vs, fs = extract_mesh_meshudf(udf_s, dirs_s)
        assert abs(len(fs) - len(fd)) <= max(2, 0.01 * len(fd))
        # symmetric nearest-vertex distance ≪ voxel
        from scipy.spatial import cKDTree

        d1, _ = cKDTree(vd).query(vs)
        d2, _ = cKDTree(vs).query(vd)
        assert max(d1.max(), d2.max()) < 0.25 * h

    def test_prime_resolution_falls_back_dense(self, trained_sphere):
        params, spec, r, alpha = trained_sphere
        # N-1 = 23 is prime: no candidate stride divides it, so the sparse
        # path must fall back to returning the dense fields unchanged
        N = 24
        udf_s, dirs_s = extract_fields_sparse(params, spec, N, "tanh", alpha)
        udf_d, dirs_d = extract_fields(params, spec, N, "tanh", alpha)
        np.testing.assert_allclose(udf_s, np.asarray(udf_d), atol=1e-6)
        np.testing.assert_allclose(dirs_s, np.asarray(dirs_d), atol=1e-6)

    def test_sharded_matches_single(self, trained_sphere):
        import jax

        from diffudf_tpu.parallel.mesh import data_mesh

        params, spec, r, alpha = trained_sphere
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        N = 25  # N-1 = 24: stride 3
        mesh = data_mesh(8)
        u1, d1 = extract_fields_sparse(params, spec, N, "tanh", alpha)
        u8, d8 = extract_fields_sparse(params, spec, N, "tanh", alpha, mesh=mesh)
        np.testing.assert_allclose(u8, u1, atol=1e-5)
        np.testing.assert_allclose(d8, d1, atol=1e-4)
