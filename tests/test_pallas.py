"""Pallas fused-VGH kernel: correctness in interpreter mode (CPU CI).

Real-TPU execution/perf is exercised by bench.py and the grid-extraction
path; here we verify the kernel math is identical to the reference
Taylor-mode implementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl

import diffudf_tpu.ops.pallas_vgh as pv
from diffudf_tpu.autodiff.ops import value_grad_hessian_packed
from diffudf_tpu.fields.siren import SirenSpec, init_siren


@pytest.fixture
def interp(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pv.pl, "pallas_call", interp_call)


class TestPallasVGH:
    def test_matches_reference(self, interp):
        spec = SirenSpec(hidden=(256,) * 8)
        params = init_siren(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3), minval=-1, maxval=1)
        f1, g1, h1 = pv.vgh_pallas(params, spec, x, tile=256)
        f0, g0, h0 = value_grad_hessian_packed(params, spec, x)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=5e-3)

    def test_small_net(self, interp):
        spec = SirenSpec(hidden=(128, 128, 128), w0=30)
        params = init_siren(jax.random.PRNGKey(2), spec)
        x = jax.random.uniform(jax.random.PRNGKey(3), (256, 3), minval=-1, maxval=1)
        f1, g1, h1 = pv.vgh_pallas(params, spec, x, tile=256)
        f0, g0, h0 = value_grad_hessian_packed(params, spec, x)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=1e-3)

    def test_rejects_nonuniform(self):
        spec = SirenSpec(hidden=(64, 128))
        params = init_siren(jax.random.PRNGKey(4), spec)
        with pytest.raises(ValueError):
            pv.vgh_pallas(params, spec, jnp.zeros((256, 3)))

    def test_rejects_bad_tile(self):
        spec = SirenSpec(hidden=(64, 64))
        params = init_siren(jax.random.PRNGKey(5), spec)
        with pytest.raises(ValueError):
            pv.vgh_pallas(params, spec, jnp.zeros((100, 3)), tile=256)
