"""Sphere tracer, camera, shading and point-cloud extraction tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffudf_tpu.render.camera import cube_entry_points, look_at_rotation, world_rays
from diffudf_tpu.render.tracer import trace_rays, hit_attributes
from diffudf_tpu.render.shading import phong_shading, ward_reflectance
from diffudf_tpu.pc.sampler import (
    generate_point_cloud,
    orient_normals_consistent,
    project_points,
)


class TestCamera:
    def test_look_at_points_to_origin(self):
        cam = np.array([2.0, 1.0, 3.0])
        R = look_at_rotation(cam)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        # end-to-end: the central ray points from the camera toward the origin
        rays = world_rays(33, 33, 60, cam, noise=0.5)
        central = rays.reshape(33, 33, 3)[16, 16]
        want = -cam / np.linalg.norm(cam)
        cos = central @ want
        assert cos > 0.999

    def test_rays_hit_cube(self):
        cam = [0.9, 0.7, 2.9]
        rays = world_rays(64, 64, 120, cam, noise=0.5)
        start, valid = cube_entry_points(rays, cam)
        assert valid.sum() > 100
        # entry points lie on the cube boundary
        on_face = np.isclose(np.abs(start[valid]).max(axis=1), 1.0, atol=2e-3)
        assert on_face.mean() > 0.99

    def test_rays_miss(self):
        cam = [5.0, 0.0, 0.0]
        rays = np.array([[1.0, 0.0, 0.0]])  # pointing away from the cube
        start, valid = cube_entry_points(rays, cam)
        assert not valid[0]

    def test_look_at_y_axis_finite(self):
        """Top-down camera: the y-up projection is degenerate on the ±y
        axis and used to divide by zero (all-NaN rotation)."""
        for cam in ([0.0, 2.0, 0.0], [0.0, -2.0, 0.0], [1e-9, 2.0, 0.0]):
            R = look_at_rotation(np.array(cam))
            assert np.isfinite(R).all()
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
            rays = world_rays(9, 9, 60, cam, noise=0.5)
            central = rays.reshape(9, 9, 3)[4, 4]
            want = -np.asarray(cam) / np.linalg.norm(cam)
            assert central @ want > 0.999

    def test_entry_points_strictly_inside_domain(self):
        """Entry points must sit strictly inside the open cube: the face
        tolerance (±1.001) could admit points the tracer's in-domain test
        would kill on the first iteration."""
        rng = np.random.default_rng(3)
        for _ in range(5):
            cam = rng.uniform(1.2, 3.0, 3) * rng.choice([-1.0, 1.0], 3)
            rays = world_rays(48, 48, 110, cam, noise=0.5)
            start, valid = cube_entry_points(rays, cam)
            if valid.any():
                assert np.abs(start[valid]).max() < 1.0


class TestTracer:
    def test_trace_sphere(self, trained_sphere):
        params, spec, r, alpha = trained_sphere
        cam = [0.0, 0.0, 2.5]
        # fov 35: the r=0.7 sphere (half-angle ~16°) fills the central frame
        # and no ray wanders into the domain corners, where this deliberately
        # small test model has spurious field zeros
        rays = world_rays(48, 48, 35, cam, noise=0.5)
        t0, valid = cube_entry_points(rays, cam)
        pos, hits, iters = trace_rays(
            params, spec, jnp.asarray(t0, jnp.float32), jnp.asarray(rays, jnp.float32),
            jnp.asarray(valid), gt_mode="tanh", alpha=alpha,
            surface_threshold=0.02, max_iterations=80,
        )
        hits = np.asarray(hits)
        pos = np.asarray(pos)
        assert hits.sum() > 200  # the sphere covers a good part of the frame
        rr = np.linalg.norm(pos[hits], axis=1)
        # hit points on the r=0.7 sphere (tracer tolerance ~ inverse(thresh));
        # silhouette-grazing rays can land off the sphere — bulk percentiles
        assert np.percentile(np.abs(rr - r), 90) < 0.08
        assert np.median(np.abs(rr - r)) < 0.03
        # central region hits
        hits_img = hits.reshape(48, 48)
        assert hits_img[20:28, 20:28].mean() > 0.5

    def test_hit_attributes_normals_radial(self, trained_sphere):
        params, spec, r, alpha = trained_sphere
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(4096, 3)).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        pts *= r
        attrs = hit_attributes(params, spec, jnp.asarray(pts), curvature_mode="none")
        normals = np.asarray(attrs["normals"])
        radial = pts / r
        cos = np.abs(np.sum(normals * radial, axis=1))
        assert np.median(cos) > 0.97

    def test_mean_curvature_of_sphere(self, trained_sphere):
        params, spec, r, alpha = trained_sphere
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(512, 3)).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        pts *= r
        attrs = hit_attributes(
            params, spec, jnp.asarray(pts), curvature_mode="mean", tile=512
        )
        curv = np.asarray(attrs["curvature"])
        # |mean curvature| of the normal field on a sphere of radius r ≈ 1/r;
        # learned fields are noisy — check the bulk magnitude
        assert 0.3 / r < np.median(np.abs(curv)) < 3.0 / r


class TestShading:
    def _setup(self):
        n = 16
        samples = np.random.default_rng(2).normal(size=(n, 3))
        hits = np.zeros(n, bool)
        hits[:8] = True
        normals = np.tile(np.array([0.0, 0.0, 1.0]), (8, 1))
        return samples, hits, normals

    def test_phong_range(self):
        samples, hits, normals = self._setup()
        colors = phong_shading([1, 2, 10], 40, hits, samples, normals)
        assert colors.shape == samples.shape
        assert (colors[hits] <= 0.9 + 1e-9).all() and (colors[hits] >= 0).all()
        np.testing.assert_allclose(colors[~hits], 1.0)

    def test_ward_finite(self):
        samples, hits, normals = self._setup()
        pc1 = np.tile(np.array([1.0, 0, 0]), (8, 1))
        pc2 = np.tile(np.array([0.0, 1.0, 0]), (8, 1))
        colors = ward_reflectance([1, 2, 10], [0, 0, 3], hits, samples, normals,
                                  0.2, 0.2, pc1, pc2)
        assert np.isfinite(colors).all()

    def test_phong_colormap(self):
        samples, hits, normals = self._setup()
        cmap = np.tile(np.array([[1.0, 0.0, 0.0]]), (8, 1))
        colors = phong_shading([0, 0, 10], -1, hits, samples, normals, color_map=cmap)
        # red channel dominates for colormapped hits
        assert (colors[hits][:, 0] >= colors[hits][:, 1]).all()


class TestPointCloud:
    def test_projection_converges(self, trained_sphere):
        params, spec, r, alpha = trained_sphere
        x0 = jax.random.uniform(jax.random.PRNGKey(3), (2048, 3), minval=-1, maxval=1)
        x, step, normals = project_points(
            params, spec, x0, gt_mode="tanh", alpha=alpha,
            num_steps=6, want_hessian_normals=True,
        )
        x = np.asarray(x)
        close = np.abs(np.linalg.norm(x, axis=1) - r) < 0.05
        # uniform starts include points whose projection path stalls in
        # poorly-fit far-field regions; half converging in 6 steps is healthy
        assert close.mean() > 0.45

    def test_generate_point_cloud(self, trained_sphere):
        params, spec, r, alpha = trained_sphere
        pts, normals = generate_point_cloud(
            params, spec, gt_mode="tanh", alpha=alpha,
            num_steps=6, num_points=2000, surf_thresh=0.01, max_iter=20,
        )
        assert len(pts) >= 2000
        rr = np.linalg.norm(pts, axis=1)
        assert np.median(np.abs(rr - r)) < 0.03
        cos = np.abs(np.sum(normals * (pts / rr[:, None]), axis=1))
        assert np.median(cos) > 0.95

    def test_orient_normals(self):
        rng = np.random.default_rng(5)
        pts = rng.normal(size=(500, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        outward = pts.copy()
        flipped = outward * np.where(rng.random(500)[:, None] < 0.5, -1.0, 1.0)
        oriented = orient_normals_consistent(pts, flipped, k=10)
        cos = np.sum(oriented * outward, axis=1)
        # consistent: (almost) all point the same way
        assert (np.abs(np.sign(cos).sum()) / 500) > 0.95


class TestOverRelaxation:
    def test_relaxed_march_matches_conservative(self, trained_sphere):
        """omega > 1 must converge to the same hits/positions."""
        params, spec, r, alpha = trained_sphere
        cam = [0.0, 0.0, 2.5]
        rays = world_rays(32, 32, 35, cam, noise=0.5)
        t0, valid = cube_entry_points(rays, cam)
        from diffudf_tpu.render.tracer import trace_rays_compacted

        kw = dict(gt_mode="tanh", alpha=alpha, surface_threshold=0.02,
                  max_iterations=80)
        p1, h1, _ = trace_rays_compacted(params, spec, t0, rays, valid,
                                         relaxation=1.0, **kw)
        p2, h2, _ = trace_rays_compacted(params, spec, t0, rays, valid,
                                         relaxation=1.6, **kw)
        # the session's weak test model has fuzzy convergence at grazing
        # rays; on converged models agreement is >0.999 (see PERFORMANCE.md)
        assert (h1 == h2).mean() > 0.85
        both = h1 & h2
        if both.any():
            d = np.linalg.norm(p1[both] - p2[both], axis=1)
            assert np.median(d) < 0.05

    def test_relaxed_overshoot_out_of_domain_rescued(self, monkeypatch):
        """A surface hugging a cube face: the over-relaxed step routinely
        overshoots OUT of [-1,1]³ there, and used to kill the ray instead
        of falling back to the conservative step.  Uses an analytic plane
        field (monkeypatched ``value``) so the geometry is deterministic:
        from x0 ∈ [0.3, 0.5] toward the plane x=0.9, the very first
        ω=1.6 step exits the +x face while the conservative step stays
        comfortably inside and converges."""
        from diffudf_tpu.render import tracer

        alpha = 10.0

        def plane_value(params, spec, pts, compute_dtype=None):
            d = jnp.abs(0.9 - pts[:, 0])
            return d * jnp.tanh(alpha * d)  # exact tanh-UDF of the plane

        monkeypatch.setattr(tracer, "value", plane_value)

        x0 = np.array([0.3, 0.38, 0.45, 0.5], np.float32)
        t0 = jnp.asarray(np.stack(
            [x0, np.zeros_like(x0), np.zeros_like(x0)], axis=1
        ))
        d = np.array([[0.8, 0.0, 0.6]], np.float32)
        rays = jnp.asarray(np.tile(d / np.linalg.norm(d), (len(x0), 1)))
        active = jnp.ones(len(x0), bool)
        hits = jnp.zeros(len(x0), bool)
        pos, act, hit = tracer._trace_segment_body(
            None, None, t0, rays, active, hits,
            gt_mode="tanh", alpha=alpha, surface_threshold=0.02,
            segment=12, fast=False, use_pallas=False, relaxation=1.6,
        )
        pos, hit = np.asarray(pos), np.asarray(hit)
        assert hit.all()  # old behavior: every ray killed on iteration 1
        np.testing.assert_allclose(pos[:, 0], 0.9, atol=0.03)


class TestShardedRendering:
    """VERDICT #9: rays / candidate points sharded over the device mesh must
    reproduce the single-device results (per-ray independence + replicated
    params make the sharded run numerically identical)."""

    @pytest.fixture()
    def mesh8(self):
        from diffudf_tpu.parallel.mesh import data_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        return data_mesh(8)

    def test_trace_rays_sharded_matches_single(self, trained_sphere, mesh8):
        params, spec, r, alpha = trained_sphere
        cam = [0.0, 0.0, 2.5]
        rays = world_rays(32, 32, 35, cam, noise=0.5)  # 1024 rays = 8·128
        t0, valid = cube_entry_points(rays, cam)
        args = (
            params, spec, jnp.asarray(t0, jnp.float32),
            jnp.asarray(rays, jnp.float32), jnp.asarray(valid),
        )
        kw = dict(gt_mode="tanh", alpha=alpha, surface_threshold=0.02,
                  max_iterations=80)
        p1, h1, _ = trace_rays(*args, **kw)
        p8, h8, _ = trace_rays(*args, mesh=mesh8, **kw)
        np.testing.assert_array_equal(np.asarray(h8), np.asarray(h1))
        np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-6)

    def test_project_points_sharded_matches_single(self, trained_sphere, mesh8):
        params, spec, r, alpha = trained_sphere
        x0 = jax.random.uniform(jax.random.PRNGKey(3), (2048, 3),
                                minval=-1, maxval=1)
        kw = dict(gt_mode="tanh", alpha=alpha, num_steps=6,
                  want_hessian_normals=True)
        x1, s1, n1 = project_points(params, spec, x0, **kw)
        x8, s8, n8 = project_points(params, spec, x0, mesh=mesh8, **kw)
        np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(n8), np.asarray(n1), atol=1e-5)

    def test_generate_point_cloud_sharded(self, trained_sphere, mesh8):
        params, spec, r, alpha = trained_sphere
        pts, normals = generate_point_cloud(
            params, spec, gt_mode="tanh", alpha=alpha,
            num_steps=6, num_points=2000, surf_thresh=0.01, max_iter=20,
            mesh=mesh8,
        )
        assert len(pts) >= 2000
        rr = np.linalg.norm(pts, axis=1)
        assert np.median(np.abs(rr - r)) < 0.03


class TestTracerHelpers:
    def test_bucket_for_power_of_four(self):
        from diffudf_tpu.render.tracer import _bucket_for

        n = 519168
        assert _bucket_for(1, n) == 1024
        assert _bucket_for(1024, n) == 1024
        assert _bucket_for(1025, n) == 4096
        assert _bucket_for(70000, n) == 262144
        assert _bucket_for(300000, n) == n  # capped at n
        assert _bucket_for(n, n) == n

    def test_gather_rows_matches_fancy_index(self):
        import jax.numpy as jnp

        from diffudf_tpu.render.tracer import gather_rows

        rng = np.random.default_rng(0)
        arr = jnp.asarray(rng.random((5000, 3)).astype(np.float32))
        idx = rng.choice(5000, size=1337, replace=False)
        out = gather_rows(arr, idx, floor=64)
        np.testing.assert_array_equal(out, np.asarray(arr)[idx])
        assert gather_rows(arr, np.zeros(0, np.int64)).shape == (0, 3)

    def test_warmup_compacted_covers_buckets(self, trained_sphere):
        from diffudf_tpu.render.tracer import warmup_compacted

        params, spec, r, alpha = trained_sphere
        # smoke: compiles and runs every (bucket, segment) round variant
        warmup_compacted(
            params, spec, 2048, gt_mode="tanh", alpha=alpha,
            surface_threshold=0.01, max_iterations=20, segment=8,
        )


class TestDeviceCamera:
    """camera_rays_device == the f64 host camera path (round-5 ST lever)."""

    def test_matches_host_path(self):
        from diffudf_tpu.render.camera import camera_rays_device

        W, H, fov = 64, 48, 40.0
        cam = np.array([2.0, 2.0, 3.5])
        for noise in (0.5, 0.17):
            rays_h = world_rays(W, H, fov, cam, noise)
            t0_h, valid_h = cube_entry_points(rays_h, cam, None)
            rays_d, t0_d, valid_d = camera_rays_device(W, H, fov, cam, noise)
            np.testing.assert_allclose(np.asarray(rays_d), rays_h, atol=2e-6)
            np.testing.assert_array_equal(np.asarray(valid_d), valid_h)
            # entry points: f32 vs f64 ray/plane intersection, edge rays
            # graze the cube faces -> compare only where both are valid
            np.testing.assert_allclose(
                np.asarray(t0_d)[valid_h], t0_h[valid_h], atol=1e-4
            )

    def test_custom_planes(self):
        from diffudf_tpu.render.camera import camera_rays_device

        cam = np.array([0.0, 0.0, 2.5])
        planes = [0.5, -0.5, 0.5, -0.5, 0.5, -0.5]
        rays_h = world_rays(32, 32, 60.0, cam, 0.5)
        t0_h, valid_h = cube_entry_points(rays_h, cam, planes)
        _, t0_d, valid_d = camera_rays_device(32, 32, 60.0, cam, 0.5, planes)
        np.testing.assert_array_equal(np.asarray(valid_d), valid_h)
        np.testing.assert_allclose(
            np.asarray(t0_d)[valid_h], t0_h[valid_h], atol=1e-4
        )

    def test_no_matmul_in_camera_jaxpr(self):
        """The camera must contain NO dot_general: on TPU the default
        matmul precision feeds the MXU bf16 inputs, which quantized ray
        directions to ~2e-3 (visible shading stripes, thousands of flipped
        silhouette hits at 256² fov 40 — caught on the real chip, invisible
        to these CPU tests where default matmuls are f32).  The rotation
        and plane dots are spelled elementwise; this pins that invariant
        where the CPU suite CAN check it."""
        import jax
        import jax.numpy as jnp

        from diffudf_tpu.render.camera import (
            _camera_rays_jit,
            look_at_rotation,
        )

        cam = np.array([2.0, 2.0, 3.5])
        jaxpr = jax.make_jaxpr(
            lambda c, r: _camera_rays_jit.__wrapped__(
                64, 48, 40.0, c, r, jnp.float32(0.5), None
            )
        )(
            jnp.asarray(cam, jnp.float32),
            jnp.asarray(look_at_rotation(cam), jnp.float32),
        )
        assert "dot_general" not in str(jaxpr)
