"""Vertex refinement (field reprojection) and Taubin smoothing tests."""

import numpy as np
import pytest

from diffudf_tpu.extract.postprocess import taubin_smooth
from diffudf_tpu.extract.refine import refine_vertices


def _uv_sphere(r=0.7, n_u=24, n_v=12):
    """Simple UV-sphere mesh (poles excluded from the quad grid)."""
    u = np.linspace(0, 2 * np.pi, n_u, endpoint=False)
    v = np.linspace(0.15 * np.pi, 0.85 * np.pi, n_v)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    verts = np.stack(
        [
            r * np.sin(vv) * np.cos(uu),
            r * np.sin(vv) * np.sin(uu),
            r * np.cos(vv),
        ],
        axis=-1,
    ).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(n_u):
        for j in range(n_v - 1):
            a = i * n_v + j
            b = ((i + 1) % n_u) * n_v + j
            faces.append([a, b, a + 1])
            faces.append([b, b + 1, a + 1])
    return verts, np.asarray(faces, np.int64)


class TestRefine:
    def test_projection_reduces_radius_error(self, trained_sphere):
        params, spec, r, alpha = trained_sphere
        rng = np.random.default_rng(11)
        pts = rng.normal(size=(2048, 3)).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        # offset well above the weak fixture field's udf noise floor
        # (~1.5e-2 here vs ~1e-3 on the full recipe, PERFORMANCE.md), so the
        # projection gain is not masked by the field's own surface error
        noisy = pts * (r + rng.uniform(0.04, 0.06, (2048, 1))).astype(np.float32)
        out = refine_vertices(
            params, spec, noisy, gt_mode="tanh", alpha=alpha, N=65,
            steps=2, max_move_voxels=3.0,
        )
        err0 = np.abs(np.linalg.norm(noisy, axis=1) - r)
        err1 = np.abs(np.linalg.norm(out, axis=1) - r)
        assert np.median(err1) < 0.5 * np.median(err0)

    def test_trust_region_bounds_displacement(self, trained_sphere):
        params, spec, r, alpha = trained_sphere
        rng = np.random.default_rng(12)
        # points far off the surface want to move a lot; the cap must hold
        pts = rng.uniform(-0.3, 0.3, (512, 3)).astype(np.float32)
        N = 65
        voxel = 2.0 / (N - 1)
        out = refine_vertices(
            params, spec, pts, gt_mode="tanh", alpha=alpha, N=N,
            steps=5, max_move_voxels=0.5,
        )
        d = np.linalg.norm(out - pts, axis=1)
        assert d.max() <= 0.5 * voxel + 1e-5

    def test_zero_steps_or_empty_identity(self, trained_sphere):
        params, spec, r, alpha = trained_sphere
        pts = np.zeros((0, 3), np.float32)
        out = refine_vertices(params, spec, pts, gt_mode="tanh", alpha=alpha,
                              N=65, steps=2)
        assert out.shape == (0, 3)
        pts = np.ones((4, 3), np.float32) * 0.3
        out = refine_vertices(params, spec, pts, gt_mode="tanh", alpha=alpha,
                              N=65, steps=0)
        np.testing.assert_array_equal(out, pts)


class TestTaubin:
    def test_denoises_without_shrinking(self):
        rng = np.random.default_rng(3)
        verts, faces = _uv_sphere()
        r = np.linalg.norm(verts, axis=1)
        noisy = verts * (1 + rng.uniform(-0.03, 0.03, (len(verts), 1)))
        noisy = noisy.astype(np.float32)
        out = taubin_smooth(noisy, faces, iterations=10)
        err0 = np.abs(np.linalg.norm(noisy, axis=1) - r)
        err1 = np.abs(np.linalg.norm(out, axis=1) - r)
        assert err1.mean() < 0.5 * err0.mean()
        # shrink-free: mean radius preserved within 2%
        assert abs(np.linalg.norm(out, axis=1).mean() - r.mean()) < 0.02 * r.mean()

    def test_noop_cases(self):
        verts, faces = _uv_sphere()
        np.testing.assert_array_equal(taubin_smooth(verts, faces, 0), verts)
        out = taubin_smooth(verts, np.zeros((0, 3), np.int64), 5)
        np.testing.assert_array_equal(out, verts)
