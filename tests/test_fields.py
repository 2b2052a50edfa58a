"""Unit tests for the SIREN field core and gt transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffudf_tpu.fields import (
    SirenSpec,
    init_siren,
    siren_apply,
    gt_transform,
    gt_grad_norm,
    inverse_map,
)


def torch_siren_forward(params, spec, x):
    """Independent numpy re-implementation of the reference forward."""
    freqs = spec.freqs
    h = x
    for i, layer in enumerate(params[:-1]):
        z = h @ np.asarray(layer["w"]) + np.asarray(layer["b"])
        h = np.sin(freqs[i] * z) if spec.activation == "sine" else np.maximum(freqs[i] * z, 0)
    return h @ np.asarray(params[-1]["w"]) + np.asarray(params[-1]["b"])


class TestSiren:
    def test_forward_matches_numpy(self, key):
        spec = SirenSpec(hidden=(32, 32, 32))
        params = init_siren(key, spec)
        x = jax.random.uniform(jax.random.PRNGKey(7), (64, 3), minval=-1, maxval=1)
        got = siren_apply(params, spec, x)
        want = torch_siren_forward(params, spec, np.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_init_ranges(self, key):
        spec = SirenSpec(hidden=(256,) * 8, w0=30)
        params = init_siren(key, spec)
        w0 = np.asarray(params[0]["w"])
        assert np.abs(w0).max() <= 1 / 3 + 1e-6  # U(-1/fan_in, 1/fan_in), fan_in=3
        wh = np.asarray(params[1]["w"])
        bound = np.sqrt(6 / 256) / 30
        assert np.abs(wh).max() <= bound + 1e-6
        assert np.abs(wh).max() > bound * 0.9  # actually fills the range

    def test_relu_mode(self, key):
        spec = SirenSpec(hidden=(16, 16), activation="relu")
        params = init_siren(key, spec)
        x = jnp.ones((4, 3)) * 0.1
        y = siren_apply(params, spec, x)
        assert y.shape == (4, 1)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_shapes(self, key):
        spec = SirenSpec(hidden=(16,))
        params = init_siren(key, spec)
        assert siren_apply(params, spec, jnp.zeros((10, 3))).shape == (10, 1)


class TestTransforms:
    def test_tanh_roundtrip(self):
        # inverse(g(d)) ≈ d in the small-field regime f < 1/α where the
        # approximation sqrt(f/α) is used (d·tanh(αd) ≈ α d² for small d)
        alpha = 100.0
        d = jnp.linspace(1e-4, 5e-3, 50)
        f = gt_transform("tanh", d, alpha)
        d_back = inverse_map("tanh", f, alpha)
        np.testing.assert_allclose(np.asarray(d_back), np.asarray(d), rtol=0.05)

    def test_tanh_large_d_passthrough(self):
        alpha = 100.0
        d = jnp.array([0.5, 1.0])
        f = gt_transform("tanh", d, alpha)  # ≈ d for large αd
        d_back = inverse_map("tanh", f, alpha)
        np.testing.assert_allclose(np.asarray(d_back), np.asarray(d), rtol=0.01)

    def test_squared_roundtrip(self):
        alpha = 10.0
        d = jnp.linspace(0.01, 1.0, 20)
        f = gt_transform("squared", d, alpha)
        np.testing.assert_allclose(
            np.asarray(inverse_map("squared", f, alpha)), np.asarray(d), rtol=1e-5
        )

    def test_siren_identity(self):
        d = jnp.linspace(0.01, 1.0, 20)
        assert np.allclose(np.asarray(gt_transform("siren", d, 1.0)), np.asarray(d))
        assert np.allclose(np.asarray(inverse_map("siren", d, 1.0)), np.asarray(d))
        # negative values clamp to min_step
        out = inverse_map("siren", jnp.array([-0.5]), 1.0, min_step=0.01)
        np.testing.assert_allclose(np.asarray(out), [0.01])

    def test_grad_norm_is_derivative(self):
        # |∇g| along the distance axis equals dg/dd
        alpha = 100.0
        d = jnp.linspace(1e-3, 0.5, 200)
        g = jax.vmap(jax.grad(lambda dd: gt_transform("tanh", dd, alpha)))(d)
        want = gt_grad_norm("tanh", d, alpha)
        np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=1e-4)

    def test_even_in_sign(self):
        # signed and unsigned GT coincide for tanh/squared (mesh-mode parity)
        alpha = 50.0
        d = jnp.linspace(-0.5, 0.5, 41)
        np.testing.assert_allclose(
            np.asarray(gt_transform("tanh", d, alpha)),
            np.asarray(gt_transform("tanh", jnp.abs(d), alpha)),
            atol=1e-7,
        )

    def test_invalid_mode(self):
        with pytest.raises(ValueError):
            gt_transform("bogus", jnp.zeros(1), 1.0)
