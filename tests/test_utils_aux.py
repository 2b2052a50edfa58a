"""Tests for metrics/timing utils, aux losses, principal directions, sharding."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffudf_tpu.utils.metrics import ScalarLogger
from diffudf_tpu.utils.timing import PhaseTimer


class TestScalarLogger:
    def test_csv_roundtrip(self, tmp_path):
        lg = ScalarLogger(str(tmp_path), tensorboard=False)
        lg.log_array("loss", 0, [3.0, 2.0, 1.0])
        lg.log_array("loss", 3, [0.5])
        lg.log_array("aux", 0, [9.0, 8.0, 7.0, 6.0])
        path = lg.flush_csv("losses.csv")
        rows = open(path).read().strip().split("\n")
        assert rows[0] == "aux;loss"
        assert rows[1] == "9.0;3.0"
        assert rows[4] == "6.0;0.5"

    def test_exclude(self, tmp_path):
        lg = ScalarLogger(str(tmp_path), tensorboard=False)
        lg.log("lr", 0, 1e-4)
        lg.log("loss", 0, 1.0)
        path = lg.flush_csv(exclude=("lr",))
        assert "lr" not in open(path).read()

    def test_tensorboard_writer(self, tmp_path):
        lg = ScalarLogger(str(tmp_path), tensorboard=True)
        lg.log_array("x", 0, [1.0, 2.0])
        lg.close()
        summaries = os.path.join(str(tmp_path), "summaries")
        assert os.path.isdir(summaries)
        assert len(os.listdir(summaries)) >= 1  # event file written


class TestPhaseTimer:
    def test_accumulates(self):
        import time

        t = PhaseTimer()
        with t.phase("a"):
            time.sleep(0.01)
        with t.phase("a"):
            time.sleep(0.01)
        with t.phase("b"):
            pass
        rep = t.report()
        assert rep["a"]["calls"] == 2
        assert rep["a"]["seconds"] >= 0.02
        assert "b" in rep


class TestPrincipalDirections:
    def test_cylinder(self):
        from diffudf_tpu.autodiff.curvature import principal_directions

        # f = distance to a cylinder axis − r: principal dirs = axial and
        # tangential.  The Che formula degenerates when ∇f_z = 0 (known
        # reference caveat, diff_operators.py:56-59), so tilt the cylinder
        # with a generic rotation to keep g_z ≠ 0.
        rng = np.random.default_rng(0)
        theta = rng.uniform(0, 2 * np.pi, 100)
        r = 0.5
        # rotation taking ẑ to a generic axis
        R, _ = np.linalg.qr(np.array([[0.6, 0.1, 0.2],
                                      [0.2, 0.8, -0.3],
                                      [0.5, 0.3, 0.9]]))
        grad0 = np.stack([np.cos(theta), np.sin(theta), np.zeros_like(theta)], -1)
        hess0 = np.zeros((100, 3, 3))
        for i in range(100):
            rho = grad0[i]
            hess0[i] = (np.diag([1.0, 1.0, 0.0]) - np.outer(rho, rho)) / r
        grad = grad0 @ R.T
        hess = np.einsum("ai,nij,bj->nab", R, hess0, R)
        t1, t2, umb = principal_directions(
            jnp.asarray(grad, jnp.float32), jnp.asarray(hess, jnp.float32)
        )
        t1, t2 = np.asarray(t1), np.asarray(t2)
        axial = np.tile(R[:, 2], (100, 1))
        tangential = np.stack([-np.sin(theta), np.cos(theta), np.zeros_like(theta)], -1) @ R.T

        def dir_cos(a, b):
            na = np.linalg.norm(a, axis=-1)
            return np.abs(np.sum(a * b, axis=-1)) / np.maximum(na, 1e-12)

        # each principal direction matches one of {axial, tangential}
        c1 = np.maximum(dir_cos(t1, axial), dir_cos(t1, tangential))
        c2 = np.maximum(dir_cos(t2, axial), dir_cos(t2, tangential))
        assert np.median(c1) > 0.99
        assert np.median(c2) > 0.99
        assert not umb.any()

    def test_umbilical_sphere(self):
        from diffudf_tpu.autodiff.curvature import principal_directions

        # on a sphere every point is umbilical: U=V=W=0
        g = jnp.asarray([[0.0, 0.0, 1.0]])
        h = jnp.asarray(np.diag([2.0, 2.0, 0.0])[None].astype(np.float32))
        _, _, umb = principal_directions(g, h)
        assert bool(umb[0])


class TestAuxLosses:
    def test_total_variation_smoke(self):
        from diffudf_tpu.fields import SirenSpec, init_siren
        from diffudf_tpu.train.losses import total_variation

        spec = SirenSpec(hidden=(16,))
        params = init_siren(jax.random.PRNGKey(0), spec)
        pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
        sdf = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (64, 1)))
        v = total_variation(params, spec, pts, sdf, 10.0)
        assert np.isfinite(float(v))

    def test_grad_consistency_smoke(self):
        from diffudf_tpu.fields import SirenSpec, init_siren
        from diffudf_tpu.train.losses import grad_consistency

        spec = SirenSpec(hidden=(16,))
        params = init_siren(jax.random.PRNGKey(0), spec)
        pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
        nrm = pts / jnp.linalg.norm(pts, axis=1, keepdims=True)
        a, b, c = grad_consistency(params, spec, jax.random.PRNGKey(3), pts, nrm, 10.0)
        assert all(np.isfinite(float(x)) for x in (a, b, c))


class TestMultiDevice:
    """Sharding tests on the 8-device CPU mesh (conftest forces it)."""

    def test_mesh_has_8_devices(self):
        assert len(jax.devices()) == 8

    def test_sharded_train_step(self):
        from diffudf_tpu.config import TrainConfig
        from diffudf_tpu.data.sampling import TrainingSampler
        from diffudf_tpu.fields.siren import SirenSpec
        from diffudf_tpu.parallel.mesh import data_mesh
        from diffudf_tpu.train.loop import Trainer

        mesh = data_mesh(8)
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(512, 3)).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        cfg = TrainConfig(num_epochs=3, s1_epochs=2, warmup_epochs=0,
                          batch_size=192, sampling_percentiles=(1 / 3, 2 / 3),
                          alpha=10.0, lr_s1=1e-4, lr_s2=1e-6)
        spec = SirenSpec(hidden=(32, 32))
        sampler = TrainingSampler.from_point_cloud(
            pts, pts, cfg.batch_size, cfg.sampling_percentiles
        )
        trainer = Trainer(spec, sampler, cfg, mesh=mesh)
        state, losses, _ = trainer.run(chunk_size=2)
        assert np.isfinite(losses["total"]).all()

    @pytest.mark.parametrize("stage", ["s1", "s2"])
    def test_sharded_matches_union_batch(self, stage):
        # The sharded DP step samples a per-device [surf|far|near] sub-batch
        # (balanced semantics, zero resharding); its contract is that the
        # pmean'd/psum'd terms equal the masked single-device loss evaluated
        # on the UNION of those sub-batches (equal shard sizes make the mean
        # of per-shard means the union mean; s2 psums its statistics).
        from diffudf_tpu.config import TrainConfig
        from diffudf_tpu.data.sampling import TrainingSampler
        from diffudf_tpu.fields.siren import SirenSpec
        from diffudf_tpu.parallel.mesh import data_mesh
        from diffudf_tpu.train.loop import Trainer

        rng = np.random.default_rng(1)
        pts = rng.normal(size=(256, 3)).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        cfg = TrainConfig(num_epochs=2, s1_epochs=2, warmup_epochs=0,
                          batch_size=96, sampling_percentiles=(1 / 3, 2 / 3),
                          alpha=10.0, lr_s1=1e-4, lr_s2=1e-6,
                          deriv_dtype="float32")
        spec = SirenSpec(hidden=(16,))
        sampler = TrainingSampler.from_point_cloud(
            pts, pts, cfg.batch_size, cfg.sampling_percentiles
        )
        t8 = Trainer(spec, sampler, cfg, mesh=data_mesh(8))
        state = t8.init_state()
        batch_step = t8._build_sharded_batch_step(stage)
        key = jax.random.PRNGKey(42)
        (_, _, grads), (tot, terms) = jax.jit(batch_step)(
            (state.params, state.opt_state), sampler, key
        )

        # assemble the identical union batch on one device
        local = t8.sampler.local(8)
        keys = [jax.random.fold_in(key, i) for i in range(8)]
        parts = [local.sample(k) for k in keys]
        upts = jnp.concatenate([p[0] for p in parts])
        unrm = jnp.concatenate([p[1] for p in parts])
        usdf = jnp.concatenate([p[2] for p in parts])
        terms_ref = t8._loss_terms(stage, state.params, upts, unrm, usdf)
        for k in terms:
            np.testing.assert_allclose(
                float(terms[k]), float(terms_ref[k]), rtol=2e-5,
                err_msg=f"term {k} ({stage})",
            )
        # gradients flow (psum of per-shard grads)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)

    def test_sharded_field_eval(self):
        from diffudf_tpu.fields.siren import SirenSpec, init_siren
        from diffudf_tpu.ops.evaluate import evaluate_field
        from diffudf_tpu.parallel.mesh import data_mesh

        mesh = data_mesh(8)
        spec = SirenSpec(hidden=(16,))
        params = init_siren(jax.random.PRNGKey(0), spec)
        pts = np.random.default_rng(2).uniform(-1, 1, (1000, 3)).astype(np.float32)
        ev_sharded = evaluate_field(params, spec, pts, want_grad=True,
                                    want_hess=True, tile=32, mesh=mesh)
        ev_single = evaluate_field(params, spec, pts, want_grad=True,
                                   want_hess=True, tile=32)
        np.testing.assert_allclose(
            np.asarray(ev_sharded.f), np.asarray(ev_single.f), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ev_sharded.hess), np.asarray(ev_single.hess), atol=1e-3
        )


class TestProtocolFloor:
    def test_floor_positive_and_small_on_sphere(self):
        from diffudf_tpu.data.mesh_io import Mesh
        from diffudf_tpu.eval.chamfer import protocol_floor

        # coarse UV sphere: the floor must be positive (finite sampling)
        # yet far below typical reconstruction scores at this density
        import numpy as np

        nu, nv, r = 48, 24, 0.7
        u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
        v = np.linspace(1e-3, np.pi - 1e-3, nv)
        uu, vv = np.meshgrid(u, v, indexing="ij")
        verts = np.stack([
            r * np.sin(vv) * np.cos(uu),
            r * np.sin(vv) * np.sin(uu),
            r * np.cos(vv),
        ], -1).reshape(-1, 3)
        faces = []
        for i in range(nu):
            for j in range(nv - 1):
                a, b = i * nv + j, ((i + 1) % nu) * nv + j
                faces.append([a, b, a + 1])
                faces.append([b, b + 1, a + 1])
        mesh = Mesh(verts.astype(np.float32), np.asarray(faces))
        cd, nc = protocol_floor(mesh, n_samples=5000)
        assert 0 < cd < 0.1
        assert 0 < nc < 0.05


class TestNearestNeighborPadding:
    def test_non_power_of_two_chunk(self):
        """Padding must round the reference length up to a multiple of
        y_chunk for ANY chunk length, not just powers of two (regression:
        the power-of-two bucket alone broke the scan reshape)."""
        import numpy as np

        from diffudf_tpu.eval.chamfer import nearest_neighbor

        rng = np.random.default_rng(0)
        x = rng.normal(size=(300, 3)).astype(np.float32)
        y = rng.normal(size=(5000, 3)).astype(np.float32)
        d, i = nearest_neighbor(x, y, norm=2, y_chunk=3000)
        brute = ((x[:, None] - y[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(i), brute.argmin(1))
        # the expanded |x|²-2xy+|y|² form carries ~1e-6 cancellation noise
        np.testing.assert_allclose(np.asarray(d), brute.min(1), rtol=1e-5, atol=5e-6)


class TestNextBucket:
    def test_ladder(self):
        from diffudf_tpu.utils.buckets import next_bucket

        assert next_bucket(1, 256) == 256
        assert next_bucket(256, 256) == 256
        assert next_bucket(257, 256) == 512
        assert next_bucket(5000, 1024, factor=4) == 16384
        assert next_bucket(5000, 1024, factor=4, cap=8192) == 8192
        assert next_bucket(10, 1024, factor=4, cap=8192) == 1024
