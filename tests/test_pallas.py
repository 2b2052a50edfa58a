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


class TestPallasVG:
    def test_vg_matches_reference(self, interp):
        import diffudf_tpu.ops.pallas_vg as pg

        pg.pl.pallas_call = pv.pl.pallas_call  # interp-patched
        from diffudf_tpu.autodiff.ops import value_grad

        spec = SirenSpec(hidden=(64,) * 4)
        params = init_siren(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3), minval=-1, maxval=1)
        op = pg.make_vg_op(spec, fwd_tile=64, bwd_tile=64)
        f1, g1 = op(params, x)
        f0, g0 = value_grad(params, spec, x)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-4)

        def L_ref(p):
            f, g = value_grad(p, spec, x)
            return jnp.sum(jnp.sin(f)) + jnp.sum(g * g)

        def L_op(p):
            f, g = op(p, x)
            return jnp.sum(jnp.sin(f)) + jnp.sum(g * g)

        ga = jax.grad(L_ref)(params)
        gb = jax.grad(L_op)(params)
        for a, b in zip(ga, gb):
            scale = max(float(jnp.abs(a["w"]).max()), 1.0)
            assert float(jnp.abs(a["w"] - b["w"]).max()) < 1e-5 * scale


class TestPallasVGHGrad:
    def test_vgh_custom_vjp_gradcheck(self, interp):
        import diffudf_tpu.ops.pallas_vgh_vjp as pvj

        pvj.pl.pallas_call = pv.pl.pallas_call
        from diffudf_tpu.autodiff.ops import value_grad_hessian_packed

        spec = SirenSpec(hidden=(64,) * 3)
        params = init_siren(jax.random.PRNGKey(2), spec)
        x = jax.random.uniform(jax.random.PRNGKey(3), (64, 3), minval=-1, maxval=1)
        op = pvj.make_vgh_op(spec, fwd_tile=64, bwd_tile=64)

        def L_ref(p):
            f, g, h6 = value_grad_hessian_packed(p, spec, x)
            return jnp.sum(jnp.sin(f)) + jnp.sum(g * g) + jnp.sum(jnp.cos(h6))

        def L_op(p):
            f, g, h6 = op(p, x)
            return jnp.sum(jnp.sin(f)) + jnp.sum(g * g) + jnp.sum(jnp.cos(h6))

        ga = jax.grad(L_ref)(params)
        gb = jax.grad(L_op)(params)
        for a, b in zip(ga, gb):
            scale = max(float(jnp.abs(a["w"]).max()), 1.0)
            assert float(jnp.abs(a["w"] - b["w"]).max()) < 2e-5 * scale
            bscale = max(float(jnp.abs(a["b"]).max()), 1.0)
            assert float(jnp.abs(a["b"] - b["b"]).max()) < 2e-5 * bscale


class TestPallasDistance:
    def test_matches_bruteforce(self, interp):
        import diffudf_tpu.ops.pallas_distance as pdist

        pdist.pl.pallas_call = pv.pl.pallas_call
        rng = np.random.default_rng(0)
        cloud = rng.normal(size=(3000, 3)).astype(np.float32)
        q = rng.normal(size=(300, 3)).astype(np.float32)
        got = np.asarray(pdist.min_distance_pallas(q, cloud))
        want = np.sqrt(((q[:, None] - cloud[None]) ** 2).sum(-1)).min(1)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestPallasValue:
    def test_value_matches_reference(self, interp):
        import diffudf_tpu.ops.pallas_value as pval

        pval.pl.pallas_call = pv.pl.pallas_call
        from diffudf_tpu.autodiff.ops import value

        spec = SirenSpec(hidden=(64,) * 4)
        params = init_siren(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2048, 3), minval=-1, maxval=1)
        f1 = pval.value_pallas(params, spec, x, tile=1024)
        f0 = value(params, spec, x)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-5)

    def test_value_bf16_matches_xla_bf16(self, interp):
        """Mixed-bf16 kernel == the XLA bf16 march path to rounding noise,
        and stays within march tolerance (~1e-3) of the f32 value."""
        import diffudf_tpu.ops.pallas_value as pval

        pval.pl.pallas_call = pv.pl.pallas_call
        from diffudf_tpu.autodiff.ops import value

        spec = SirenSpec(hidden=(64,) * 4)
        params = init_siren(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2048, 3), minval=-1, maxval=1)
        fb = pval.value_pallas(params, spec, x, tile=1024,
                               compute_dtype=jnp.bfloat16)
        f0 = value(params, spec, x)
        fx = value(params, spec, x, compute_dtype=jnp.bfloat16)
        # same mixed-precision recipe -> near-identical rounding
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fx), atol=2e-3)
        # and the absolute error vs f32 stays inside the hit threshold scale
        assert np.abs(np.asarray(fb) - np.asarray(f0)).max() < 2e-2


class TestBf16Kernels:
    """compute_dtype=bf16: MXU inputs rounded, f32 accumulation — results
    must track the f32 kernels to bf16 input-rounding tolerance."""

    def test_vgh_bf16_close_to_f32(self, interp):
        import diffudf_tpu.ops.pallas_vgh as pv

        spec = SirenSpec(hidden=(64, 64, 64))
        params = init_siren(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=-1, maxval=1)
        f1, g1, h1 = pv.vgh_pallas(params, spec, x, tile=256)
        f2, g2, h2 = pv.vgh_pallas(params, spec, x, tile=256,
                                   compute_dtype=jnp.bfloat16)
        assert np.allclose(f2, f1, atol=2e-2)
        # relative tolerances scaled to the carries' magnitudes
        assert np.median(np.abs(g2 - g1)) < 1e-2 * max(np.abs(g1).max(), 1.0)
        assert np.median(np.abs(h2 - h1)) < 1e-2 * max(np.abs(h1).max(), 1.0)

    def test_vgh_vjp_bf16_grad_direction(self, interp):
        import diffudf_tpu.ops.pallas_vgh as pv
        import diffudf_tpu.ops.pallas_vgh_vjp as pvj

        pvj.pl.pallas_call = pv.pl.pallas_call
        spec = SirenSpec(hidden=(32, 32))
        params = init_siren(jax.random.PRNGKey(2), spec)
        x = jax.random.uniform(jax.random.PRNGKey(3), (64, 3), minval=-1, maxval=1)

        def loss(op, p):
            f, g, h6 = op(p, x)
            return jnp.sum(f ** 2) + jnp.sum(g ** 2) + 0.1 * jnp.sum(h6 ** 2)

        g32 = jax.grad(lambda p: loss(pvj.make_vgh_op(spec, 64, 64), p))(params)
        gbf = jax.grad(lambda p: loss(
            pvj.make_vgh_op(spec, 64, 64, compute_dtype=jnp.bfloat16), p
        ))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g32),
                        jax.tree_util.tree_leaves(gbf)):
            a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
            cos = a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
            assert cos > 0.995


class TestFastSincos:
    """ops/sincos.py: shared-range-reduction sincos used by every Pallas
    SIREN kernel (round-5 VPU-transcendental lever)."""

    def test_accuracy_across_scales(self):
        from diffudf_tpu.ops.sincos import fast_sin, fast_sincos

        rng = np.random.default_rng(0)
        for scale in (1.0, 30.0, 100.0, 300.0):
            z32 = rng.uniform(-scale, scale, 200_000).astype(np.float32)
            s, c = fast_sincos(jnp.asarray(z32))
            z64 = z32.astype(np.float64)
            assert np.abs(np.asarray(s) - np.sin(z64)).max() < 1e-6, scale
            assert np.abs(np.asarray(c) - np.cos(z64)).max() < 1e-6, scale
            s1 = fast_sin(jnp.asarray(z32))
            np.testing.assert_array_equal(np.asarray(s1), np.asarray(s))

    def test_exact_mode_is_jnp(self):
        from diffudf_tpu.ops.sincos import sincos

        z = jnp.linspace(-50.0, 50.0, 10_001, dtype=jnp.float32)
        s, c = sincos(z, fast=False)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(jnp.sin(z)))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(jnp.cos(z)))

    def test_exact_mode_kernel_identity(self, interp):
        """fast_sincos=False keeps the kernel bit-comparable on f (the
        pre-round-5 strict identity)."""
        spec = SirenSpec(hidden=(64,) * 4)
        params = init_siren(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=-1, maxval=1)
        f1, g1, h1 = pv.vgh_pallas(params, spec, x, tile=256, fast_sincos=False)
        f0, g0, h0 = value_grad_hessian_packed(params, spec, x)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-6)

    def test_fast_vs_exact_kernel_delta(self, interp):
        """Fast mode tracks exact mode at the documented ≤~1e-6-per-
        activation level through a full 8x256 stack."""
        spec = SirenSpec(hidden=(256,) * 8)
        params = init_siren(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=-1, maxval=1)
        ff, gf, hf = pv.vgh_pallas(params, spec, x, tile=256, fast_sincos=True)
        fe, ge, he = pv.vgh_pallas(params, spec, x, tile=256, fast_sincos=False)
        assert np.abs(np.asarray(ff) - np.asarray(fe)).max() < 1e-5
        assert np.abs(np.asarray(gf) - np.asarray(ge)).max() < 1e-4
        assert np.abs(np.asarray(hf) - np.asarray(he)).max() < 5e-3
