"""Tests for fused value/grad/Hessian, the 3×3 eigensolver and curvatures."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import flatten_util

from diffudf_tpu.fields import SirenSpec, init_siren
from diffudf_tpu.autodiff import (
    value,
    value_grad,
    value_grad_hessian,
    value_grad_hessian_ad,
    eigh3x3,
    top_eigenvector,
    mean_curvature,
    gaussian_curvature,
    principal_curvatures,
)
from diffudf_tpu.autodiff.ops import pack_hess, hess_from_packed, value_grad_hessian_packed


class TestFusedDerivatives:
    def _setup(self, activation="sine"):
        spec = SirenSpec(hidden=(32, 32, 32), activation=activation)
        params = init_siren(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3), minval=-1, maxval=1)
        return params, spec, x

    def test_value_grad_matches_ad(self):
        params, spec, x = self._setup()
        f, g = value_grad(params, spec, x)
        f_ad, g_ad, _ = value_grad_hessian_ad(params, spec, x)
        np.testing.assert_allclose(np.asarray(f), np.asarray(f_ad), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=1e-4)

    def test_value_grad_hessian_matches_ad(self):
        params, spec, x = self._setup()
        f, g, h = value_grad_hessian(params, spec, x)
        f_ad, g_ad, h_ad = value_grad_hessian_ad(params, spec, x)
        np.testing.assert_allclose(np.asarray(f), np.asarray(f_ad), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=1e-4)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_ad), atol=5e-3)

    def test_relu_grad(self):
        params, spec, x = self._setup("relu")
        f, g = value_grad(params, spec, x)
        f_ad, g_ad, h_ad = value_grad_hessian_ad(params, spec, x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=1e-4)
        # relu second derivative is zero a.e.
        _, _, h = value_grad_hessian(params, spec, x)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_ad), atol=1e-4)

    def test_hessian_symmetric(self):
        params, spec, x = self._setup()
        _, _, h = value_grad_hessian(params, spec, x)
        np.testing.assert_allclose(
            np.asarray(h), np.asarray(jnp.swapaxes(h, -1, -2)), atol=1e-6
        )

    def test_packed_roundtrip(self):
        h = np.random.default_rng(0).normal(size=(10, 3, 3))
        h = h + np.swapaxes(h, -1, -2)
        h6 = pack_hess(jnp.asarray(h))
        np.testing.assert_allclose(np.asarray(hess_from_packed(h6)), h, atol=1e-6)

    def test_value_consistency(self):
        params, spec, x = self._setup()
        f0 = value(params, spec, x)
        f1, _ = value_grad(params, spec, x)
        f2, _, _ = value_grad_hessian_packed(params, spec, x)
        np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(f0), np.asarray(f2), atol=1e-6)

    def test_loss_grad_flows_through(self):
        # reverse-mode through the fused forward must work (training needs it)
        params, spec, x = self._setup()

        def loss(p):
            f, g, h = value_grad_hessian(p, spec, x)
            return jnp.mean(f**2) + jnp.mean(g**2) + jnp.mean(h**2)

        grads = jax.grad(loss)(params)
        flat, _ = flatten_util.ravel_pytree(grads)
        assert np.all(np.isfinite(np.asarray(flat)))
        assert float(jnp.abs(flat).max()) > 0


class TestEigh3:
    def _random_sym(self, n=500, seed=0):
        a = np.random.default_rng(seed).normal(size=(n, 3, 3))
        return (a + np.swapaxes(a, -1, -2)).astype(np.float32)

    def test_eigenvalues_match_numpy(self):
        A = self._random_sym()
        lam, _ = eigh3x3(jnp.asarray(A))
        lam_np = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.asarray(lam), lam_np, atol=2e-4)

    def test_eigenvectors_are_eigenvectors(self):
        A = self._random_sym(seed=1)
        lam, vec = eigh3x3(jnp.asarray(A))
        lam, vec = np.asarray(lam), np.asarray(vec)
        for k in range(3):
            resid = np.einsum("nij,nj->ni", A, vec[..., k]) - lam[:, k : k + 1] * vec[..., k]
            assert np.abs(resid).max() < 5e-3

    def test_top_eigenvector_alignment(self):
        A = self._random_sym(seed=2)
        v = np.asarray(top_eigenvector(jnp.asarray(A)))
        _, vec_np = np.linalg.eigh(A)
        cos = np.abs(np.sum(v * vec_np[..., 2], axis=-1))
        assert cos.min() > 1 - 1e-4

    def test_surface_hessian_structure(self):
        # the case that matters: H ≈ 2α n nᵀ at the surface — top eigenvector
        # must recover n even with noise
        rng = np.random.default_rng(3)
        n = rng.normal(size=(200, 3))
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        H = 200.0 * np.einsum("ni,nj->nij", n, n) + 0.5 * self._random_sym(200, seed=4)
        H = 0.5 * (H + np.swapaxes(H, -1, -2))
        v = np.asarray(top_eigenvector(jnp.asarray(H.astype(np.float32))))
        cos = np.abs(np.sum(v * n, axis=-1))
        assert cos.min() > 0.999

    def test_degenerate_isotropic(self):
        A = jnp.broadcast_to(2.0 * jnp.eye(3), (4, 3, 3))
        lam, vec = eigh3x3(A)
        np.testing.assert_allclose(np.asarray(lam), 2.0, atol=1e-6)
        norms = np.linalg.norm(np.asarray(vec), axis=-2)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_diagonal(self):
        A = jnp.asarray(np.diag([3.0, -1.0, 5.0])[None].astype(np.float32))
        lam, vec = eigh3x3(A)
        np.testing.assert_allclose(np.asarray(lam[0]), [-1.0, 3.0, 5.0], atol=1e-5)
        assert abs(np.asarray(vec)[0, 2, 2]) > 0.999  # top eigvec = ẑ


class TestCurvature:
    def test_sphere_curvatures(self):
        # f(x) = |x| has mean curvature 1/r and gaussian 1/r² at radius r
        # (outward gradient convention)
        rng = np.random.default_rng(5)
        x = rng.normal(size=(300, 3)).astype(np.float32)
        r = np.linalg.norm(x, axis=-1, keepdims=True)
        x = x / r * (0.5 + 0.5 * rng.random((300, 1), dtype=np.float32))
        r = np.linalg.norm(x, axis=-1)
        grad = x / r[:, None]
        eye = np.eye(3, dtype=np.float32)
        hess = (eye[None] - np.einsum("ni,nj->nij", grad, grad)) / r[:, None, None]
        km = np.asarray(mean_curvature(jnp.asarray(grad), jnp.asarray(hess)))
        kg = np.asarray(gaussian_curvature(jnp.asarray(grad), jnp.asarray(hess)))
        np.testing.assert_allclose(km, 1.0 / r, rtol=1e-3)
        np.testing.assert_allclose(kg, 1.0 / r**2, rtol=2e-3)

    def test_principal_curvatures_sphere(self):
        grad = jnp.asarray([[0.0, 0.0, 1.0]])
        hess = jnp.asarray(np.diag([2.0, 2.0, 0.0])[None].astype(np.float32))
        kmin, kmax = principal_curvatures(grad, hess)
        np.testing.assert_allclose(np.asarray(kmin)[0], 2.0, atol=1e-2)
        np.testing.assert_allclose(np.asarray(kmax)[0], 2.0, atol=1e-2)
