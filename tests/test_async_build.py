"""Background oracle build + sampler hot-swap (data/async_build.py).

The round-5 accounting fix: the host candidate-grid build runs behind
device training on an exact bootstrap oracle, and the trainer swaps the
table sampler in at a chunk boundary.  These tests pin (a) the bootstrap
oracles' exactness against the brute sweeps, (b) the handover mechanics,
(c) the trainer-level swap, and (d) the failure path (build exception →
warning, run completes on the bootstrap).
"""

import dataclasses
import threading
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffudf_tpu.data.async_build import (
    OracleBuildHandle,
    overlapped_mesh_sampler,
    overlapped_pc_sampler,
)
from diffudf_tpu.data.mesh_distance import (
    point_cloud_distance,
    point_triangle_distance,
)
from diffudf_tpu.data.sampling import TrainingSampler


def _sphere_tris(n_theta=12, n_phi=24, radius=0.7):
    th = np.linspace(0, np.pi, n_theta)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    verts = radius * np.stack(
        [np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp), np.cos(tt)], -1
    ).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            faces.append((a, b, a + n_phi))
            faces.append((b, b + n_phi, a + n_phi))
    return verts[np.asarray(faces)]  # (F, 3, 3)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= 0.7
    return pts, pts / 0.7


class TestBootstrapOracles:
    def test_mesh_bootstrap_matches_brute(self, cloud):
        pts, nrm = cloud
        tris = _sphere_tris()
        boot = TrainingSampler.from_mesh_bootstrap(
            pts, nrm, tris, 300, [0.334, 0.666]
        )
        assert boot.tri_table is None and boot.tri_candidates is None
        p, n, sdf = jax.jit(boot.sample)(jax.random.PRNGKey(0))
        sz = boot.static.sizes
        far = p[sz.on_surface : sz.on_surface + sz.far]
        want = point_triangle_distance(far, jnp.asarray(tris))
        np.testing.assert_allclose(
            np.asarray(sdf[sz.on_surface : sz.on_surface + sz.far, 0]),
            np.asarray(want), atol=1e-5,
        )

    def test_pc_bootstrap_matches_brute(self, cloud):
        pts, nrm = cloud
        boot = TrainingSampler.from_point_cloud_bootstrap(
            pts, nrm, 300, [0.334, 0.666]
        )
        p, n, sdf = jax.jit(boot.sample)(jax.random.PRNGKey(1))
        sz = boot.static.sizes
        far = p[sz.on_surface : sz.on_surface + sz.far]
        want = point_cloud_distance(far, jnp.asarray(pts))
        np.testing.assert_allclose(
            np.asarray(sdf[sz.on_surface : sz.on_surface + sz.far, 0]),
            np.asarray(want), atol=1e-5,
        )


class TestHandover:
    def test_mesh_handover_equals_sync_sampler(self, cloud, tmp_path):
        pts, nrm = cloud
        tris = _sphere_tris()
        boot, handle = overlapped_mesh_sampler(
            pts, nrm, tris, 300, [0.334, 0.666],
            cache_path=str(tmp_path / "c.npz"),
        )
        up = handle.wait(timeout=600)
        assert up is not None and up.tri_table is not None
        assert handle.swap_epoch is None  # trainer sets it, not the handle
        # one-shot: second poll yields nothing
        assert handle.poll() is None
        sync = TrainingSampler.from_mesh(
            pts, nrm, tris, 300, [0.334, 0.666],
            cache_path=str(tmp_path / "c.npz"),
        )
        np.testing.assert_array_equal(
            np.asarray(up.tri_table), np.asarray(sync.tri_table)
        )
        # the GT stream the trainer sees is identical across the swap
        _, _, sdf_b = jax.jit(boot.sample)(jax.random.PRNGKey(2))
        _, _, sdf_u = jax.jit(up.sample)(jax.random.PRNGKey(2))
        np.testing.assert_allclose(
            np.asarray(sdf_b), np.asarray(sdf_u), atol=1e-5
        )

    def test_large_mesh_builds_synchronously(self, cloud, monkeypatch):
        """Above BOOT_TRI_MAX the flat bootstrap sweep would OOM the chip
        (O(Q·T) fused temps — measured RESOURCE_EXHAUSTED at the 65536
        bucket with the 30k recipe), so the overlap is skipped: the build
        runs synchronously and the handle is None."""
        from diffudf_tpu.data import async_build

        pts, nrm = cloud
        tris = _sphere_tris()
        monkeypatch.setattr(async_build, "BOOT_TRI_MAX",
                            len(tris) - 1)  # force the fallback cheaply
        sampler, handle = overlapped_mesh_sampler(
            pts, nrm, tris, 300, [0.334, 0.666], cache_path=None
        )
        assert handle is None
        assert sampler.tri_table is not None  # final table oracle, no boot

    def test_pc_handover(self, cloud, tmp_path):
        pts, nrm = cloud
        boot, handle = overlapped_pc_sampler(
            pts, nrm, 300, [0.334, 0.666], cache_path=None
        )
        up = handle.wait(timeout=600)
        assert up is not None and up.pc_candidates is not None
        _, _, sdf_b = jax.jit(boot.sample)(jax.random.PRNGKey(3))
        _, _, sdf_u = jax.jit(up.sample)(jax.random.PRNGKey(3))
        # pc table is exact-on-candidates: tiny far-query band allowed
        assert np.abs(np.asarray(sdf_b) - np.asarray(sdf_u)).max() < 5e-3

    def test_failed_build_warns_and_degrades(self):
        def boom():
            raise RuntimeError("no disk")

        handle = OracleBuildHandle(boom, lambda r: r)
        handle._done.wait(60)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert handle.poll() is None
        assert any("background oracle build failed" in str(x.message) for x in w)
        # subsequent polls stay silent Nones
        assert handle.poll() is None


class TestTrainerSwap:
    def test_run_hot_swaps_at_chunk_boundary(self, cloud):
        from diffudf_tpu.config import TrainConfig
        from diffudf_tpu.fields.siren import SirenSpec
        from diffudf_tpu.parallel.mesh import data_mesh
        from diffudf_tpu.train.loop import Trainer

        pts, nrm = cloud
        tris = _sphere_tris()
        boot, handle = overlapped_mesh_sampler(
            pts, nrm, tris, 192, [0.334, 0.666], cache_path=None
        )
        cfg = TrainConfig(
            num_epochs=8, s1_epochs=8, warmup_epochs=0, batch_size=192,
            alpha=10.0, lr_s1=1e-4, lr_s2=1e-6, warmup_lr=1e-4,
        )
        trainer = Trainer(SirenSpec(hidden=(16, 16)), boot, cfg,
                          mesh=data_mesh(1))
        handle.wait(timeout=600)  # drain the real handle (not under test)

        # deterministic handover: an update that returns at the 2nd boundary
        calls = {"n": 0}
        upgraded = TrainingSampler.from_mesh(
            pts, nrm, tris, 192, [0.334, 0.666], cache_path=None
        )

        def update():
            calls["n"] += 1
            return upgraded if calls["n"] == 2 else None

        state, losses, t = trainer.run(chunk_size=2, sampler_update=update)
        assert trainer.last_swap_epoch == 2  # second boundary = epoch 2
        assert trainer.sampler is upgraded
        assert np.isfinite(losses["total"]).all()
        assert trainer.callback_seconds == 0.0


class TestBootstrapUnderDP:
    def test_mesh_bootstrap_shard_map_step(self, cloud):
        """The flat brute bootstrap oracle must trace inside the 8-device
        shard_map step (each device sweeps its own sub-batch)."""
        import jax.numpy as jnp

        from diffudf_tpu.config import TrainConfig
        from diffudf_tpu.fields.siren import SirenSpec
        from diffudf_tpu.parallel.mesh import data_mesh
        from diffudf_tpu.train.loop import Trainer

        pts, nrm = cloud
        tris = _sphere_tris()
        boot = TrainingSampler.from_mesh_bootstrap(
            pts, nrm, tris, 8 * 48, [1 / 3, 2 / 3]
        )
        cfg = TrainConfig(
            num_epochs=2, s1_epochs=2, warmup_epochs=0, batch_size=8 * 48,
            sampling_percentiles=(1 / 3, 2 / 3), alpha=10.0,
            lr_s1=1e-4, lr_s2=1e-6,
        )
        trainer = Trainer(SirenSpec(hidden=(16, 16)), boot, cfg,
                          mesh=data_mesh(8))
        state, logs = trainer.chunk_fn("s1")(
            trainer.init_state(), boot, jnp.arange(2, dtype=jnp.int32)
        )
        assert np.isfinite(np.asarray(logs["total"])).all()
