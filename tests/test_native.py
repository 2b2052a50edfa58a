"""Native C++ sign-voting: build, correctness, and scipy-equivalence tests."""

import numpy as np
import pytest

from tests.test_meshudf import sphere_udf, plane_udf


def _native():
    from diffudf_tpu.native import udf_mc

    return udf_mc


def native_signs(udf, dirs, voxel):
    """Run the native MST propagation (no relaxation) over the shared
    robust edge relations."""
    import numpy as np

    from diffudf_tpu.extract.meshudf import edge_relations

    udf_mc = _native()
    part = udf < 2 * 1.75 * voxel
    weights = [
        (rel * conf * mask).astype(np.float32)
        for mask, rel, conf in edge_relations(udf, dirs, part, voxel)
    ]
    return udf_mc.sign_voting(udf, part.astype(np.uint8), *weights), part


class TestNativeSignVoting:
    def test_builds_and_runs(self):
        N = 16
        udf, dirs = sphere_udf(N)
        signs, _ = native_signs(udf, dirs, 2 / (N - 1))
        assert signs.shape == (N, N, N)
        assert set(np.unique(signs)) <= {-1, 1}

    def test_separates_sphere_sides(self):
        N = 32
        udf, dirs = sphere_udf(N)
        voxel = 2 / (N - 1)
        signs, part = native_signs(udf, dirs, voxel)
        axis = np.linspace(-1, 1, N)
        x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
        rn = np.sqrt(x**2 + y**2 + z**2)
        s_in = signs[part & (rn < 0.6)].astype(np.int32)
        s_out = signs[part & (rn > 0.6)].astype(np.int32)
        assert abs(s_in.mean()) > 0.95
        assert abs(s_out.mean()) > 0.95
        assert np.sign(s_in.mean()) != np.sign(s_out.mean())

    def test_matches_scipy_fallback(self):
        from diffudf_tpu.extract.meshudf import _signs_scipy

        udf_mc = _native()
        for maker in (sphere_udf, plane_udf):
            N = 24
            udf, dirs = maker(N)
            voxel = 2 / (N - 1)
            part = udf < 2 * 1.75 * voxel
            s_native, _ = native_signs(udf, dirs, voxel)
            s_scipy = _signs_scipy(udf, dirs, part, voxel)
            # agreement up to a global flip per connected region; for these
            # single-component fields: exact or exactly-negated inside the
            # participating set
            a = s_native[part].astype(np.int32)
            b = s_scipy[part].astype(np.int32)
            agree = (a == b).mean()
            assert agree > 0.99 or agree < 0.01, agree

    def test_used_by_extraction(self):
        # compute_signs must prefer the native path once built
        import diffudf_tpu.extract.meshudf as mu

        _native()  # ensure built
        N = 24
        udf, dirs = sphere_udf(N)
        signs = mu.compute_signs(udf, dirs, 2 / (N - 1))
        assert set(np.unique(signs)) <= {-1, 1}

    def test_empty_participation(self):
        N = 8
        udf = np.ones((N, N, N), np.float32)
        dirs = np.zeros((N, N, N, 3), np.float32)
        signs, _ = native_signs(udf, dirs, 2 / (N - 1))
        assert (signs == 1).all()
