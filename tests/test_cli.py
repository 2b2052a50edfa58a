"""CLI integration smoke tests (CPU, tiny configs): the full user journey."""

import json
import os

import numpy as np
import pytest

from diffudf_tpu.config import TrainConfig


@pytest.fixture(scope="module")
def demo_dir(tmp_path_factory):
    """Preprocessed mini torus dataset."""
    import subprocess
    import sys

    d = tmp_path_factory.mktemp("demo")
    # small torus mesh
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.make_demo import torus
    from diffudf_tpu.data.mesh_io import save_mesh

    save_mesh(str(d / "torus.obj"), torus(nu=48, nv=24))
    from diffudf_tpu.cli.preprocess import preprocess_mesh

    preprocess_mesh(str(d), str(d / "torus.obj"), surface_points=3000)
    return d


@pytest.fixture(scope="module")
def trained_dir(demo_dir):
    """A (very) short CLI training run, CPU."""
    from diffudf_tpu.cli.train import setup_train

    cfg = TrainConfig.from_dict({
        "num_epochs": 60, "s1_epochs": 50, "warmup_epochs": 10,
        "dataset": str(demo_dir / "torus"), "batch_size": 512,
        "sampling_percentiles": [0.333, 0.666], "batches_per_epoch": 1,
        "checkpoint_path": str(demo_dir / "results"), "experiment_name": "exp",
        "epochs_to_checkpoint": 0, "gt_mode": "tanh",
        "loss_s1_weights": [1e4, 1e4, 1e4, 1e3], "loss_s2_weights": [1e5, 1e5],
        "alpha": 10,
        "optimizer": {"type": "adam", "lr_s1": 1e-4, "lr_s2": 1e-6},
        "network": {"hidden_layer_nodes": [32, 32], "w0": 30, "pretrained_dict": "None"},
        "resolution": 24,
    })
    # Pin a single-device run: this fixture smoke-tests CLI artifacts, and
    # the default all-device DP mesh (8 virtual CPU devices on possibly one
    # core) is slow and rendezvous-fragile here.  The DP CLI path has its own
    # dedicated test below (setup_train with n_mesh_devices=8).
    t, meshes, state = setup_train(cfg, verbose=False, n_mesh_devices=1)
    return demo_dir / "results" / "exp", meshes, state


class TestTrainCLI:
    def test_artifacts(self, trained_dir):
        out, meshes, state = trained_dir
        assert (out / "params.json").exists()
        assert (out / "losses.csv").exists()
        assert (out / "models" / "model_best.npz").exists()
        assert (out / "models" / "model_final.npz").exists()
        assert (out / "models" / "train_state.npz").exists()
        assert (out / "reconstructions" / "distance_fields.png").exists()
        assert (out / "reconstructions" / "pred_grad.png").exists()
        assert (out / "reconstructions" / "mc_mesh_best_MU.obj").exists()
        assert (out / "reconstructions" / "mc_mesh_best_CAP.obj").exists()

    def test_losses_csv_columns(self, trained_dir):
        out, _, _ = trained_dir
        header = open(out / "losses.csv").readline().strip().split(";")
        assert "hessian_constraint" in header
        assert "std_on_surf" in header  # s2 terms present

    def test_params_json_reference_schema(self, trained_dir):
        out, _, _ = trained_dir
        d = json.load(open(out / "params.json"))
        assert d["gt_mode"] == "tanh"
        assert d["optimizer"]["lr_s1"] == 1e-4
        assert d["network"]["hidden_layer_nodes"] == [32, 32]

    def test_meshes_nonempty(self, trained_dir):
        _, meshes, _ = trained_dir
        mesh_mu, mesh_cap = meshes
        assert len(mesh_cap.faces) > 0
        assert len(mesh_mu.faces) > 0


class TestRenderCLI:
    def test_generate_st_smoke(self, trained_dir, demo_dir):
        from diffudf_tpu.cli.generate_st import generate_st

        out, _, _ = trained_dir
        cfg = {
            "network_config": {
                "alpha": 10, "gt_mode": "tanh",
                "hidden_layer_nodes": [32, 32], "w0": 30,
                "model_path": str(out / "models" / "model_best.npz"),
            },
            "rendering_config": {
                "width": 32, "height": 32, "surface_threshold": 0.05,
                "fov": 60, "camera_position": [0.0, 0.0, 2.5],
                "light_position": [1, 2.4, 10], "plot_curvatures": "none",
                "max_iterations": 40, "reflection_method": "blinn-phong",
                "shininess": 40, "sample_rate": 1, "gd_steps": 1,
                "rotation": 0,
            },
        }
        im = generate_st(cfg)
        arr = np.asarray(im)
        assert arr.shape == (32, 32, 3)
        # some pixels shaded (non-white)
        assert (arr < 250).any()

    def test_generate_st_gt_mode(self, demo_dir):
        from diffudf_tpu.cli.generate_st import generate_st

        cfg = {
            "network_config": {"gt_mode": "gt"},
            "mesh_path": str(demo_dir / "torus_t.obj"),
            "light_pos": [1, 2.4, 10],
            "max_iter": 30,
            "surface_eps": 0.01,
            "rendering_config": {
                "width": 24, "height": 24, "fov": 60,
                "camera_position": [0.0, 0.0, 2.5], "sample_rate": 1,
                "surface_threshold": 0.01,
            },
        }
        im = generate_st(cfg)
        assert np.asarray(im).shape == (24, 24, 3)


class TestQuantitative:
    def test_mesh_metrics(self, trained_dir, demo_dir):
        from diffudf_tpu.cli.quantitative import mesh_metrics
        from diffudf_tpu.data.mesh_io import load_point_cloud

        _, meshes, _ = trained_dir
        _, mesh_cap = meshes
        gt = load_point_cloud(str(demo_dir / "torus_pc.ply"))
        l1, l2, nc = mesh_metrics(mesh_cap, gt.points, gt.normals)
        # plumbing smoke test: a 60-epoch 32x32 model is deliberately bad;
        # just require finite, sane-order metrics
        assert 0 < l1 < 5.0
        assert 0 < l2 < 5.0
        assert 0 <= nc <= 2.0

    def test_sweep_pc_mode(self, demo_dir, tmp_path):
        """Directory walk auto-selects pc-mode (no _t.obj present), trains,
        extracts both meshes, and appends a well-formed CSV row.  Mirrors
        the reference's published-protocol driver (cuantitative.py:65-74)."""
        import shutil

        from diffudf_tpu.cli import quantitative

        shape_dir = tmp_path / "data" / "mini"
        shape_dir.mkdir(parents=True)
        shutil.copy(demo_dir / "torus_pc.ply", shape_dir / "mini_pc.ply")
        cfg = tmp_path / "cfg.json"
        cfg.write_text(json.dumps({
            "num_epochs": 30, "s1_epochs": 25, "warmup_epochs": 5,
            "batch_size": 512, "resolution": 24,
            "network": {"hidden_layer_nodes": [32, 32], "w0": 30,
                        "pretrained_dict": "None"},
            "optimizer": {"type": "adam", "lr_s1": 1e-4, "lr_s2": 1e-6},
        }))
        out = tmp_path / "out"
        quantitative.main([str(tmp_path / "data"), str(out), "--config", str(cfg),
                           "--no-provenance"])

        rows = (out / "results.csv").read_text().strip().splitlines()
        assert rows[0].startswith("mesh,time,L1CD_CAP")
        vals = rows[1].split(",")
        assert vals[0] == "mini" and len(vals) == 8
        assert all(np.isfinite(float(v)) for v in vals[1:])
        # pc-mode was selected: the saved config must record onlyPCloud
        params = json.loads((out / "mini" / "params.json").read_text())
        assert params["onlyPCloud"] is True
        # re-running skips the already-trained shape (failure/resume
        # semantics, reference cuantitative.py:68-69) — row count unchanged
        quantitative.main([str(tmp_path / "data"), str(out), "--config", str(cfg),
                           "--no-provenance"])
        assert len((out / "results.csv").read_text().strip().splitlines()) == 2

    def test_provenance_sidecar(self, tmp_path, monkeypatch):
        """results_provenance.json records the platform fingerprint + rev."""
        from diffudf_tpu.cli import quantitative
        from diffudf_tpu.utils import drift

        monkeypatch.setattr(
            drift, "fingerprint",
            lambda **kw: {"date": "2026-01-01", "platform": "cpu",
                          "final_loss": 1.0, "param_sum": 2.0},
        )
        (tmp_path / "data").mkdir()  # empty dataset: no shapes, just sidecar
        out = tmp_path / "out"
        quantitative.main([str(tmp_path / "data"), str(out)])
        prov = json.loads((out / "results_provenance.json").read_text())
        assert prov["final_loss"] == 1.0
        assert prov["git_rev"]  # non-empty ("unknown" allowed outside git)

        # same fingerprint on a re-run: refreshed in place, no history
        quantitative.main([str(tmp_path / "data"), str(out)])
        prov = json.loads((out / "results_provenance.json").read_text())
        assert "previous" not in prov

        # drifted fingerprint on a resumed sweep: the stale record is
        # preserved under "previous" so appended rows stay attributable
        monkeypatch.setattr(
            drift, "fingerprint",
            lambda **kw: {"date": "2026-01-02", "platform": "cpu",
                          "final_loss": 3.0, "param_sum": 4.0},
        )
        quantitative.main([str(tmp_path / "data"), str(out)])
        prov = json.loads((out / "results_provenance.json").read_text())
        assert prov["final_loss"] == 3.0
        assert prov["previous"]["final_loss"] == 1.0


class TestQualityPresets:
    def test_invalid_name_raises(self):
        from diffudf_tpu.cli.generate_mc import resolve_quality

        with pytest.raises(ValueError, match="quality"):
            resolve_quality("bogus", 256, {})

    def test_default_and_none_are_noop(self):
        from diffudf_tpu.cli.generate_mc import resolve_quality

        knobs = dict(triangulator=None, cap_taubin=3, mu_taubin=3)
        for q in (None, "default"):
            n, resolved = resolve_quality(q, 256, knobs)
            assert n == 256 and resolved == knobs

    def test_parity_turns_every_deviation_off(self):
        from diffudf_tpu.cli.generate_mc import resolve_quality

        n, k = resolve_quality("parity", 256, dict(
            triangulator=None, refine_steps=5, taubin_iters=5,
            cap_signing="vote", cap_face_prune_voxels=1.0, cap_taubin=3,
            mu_face_prune_voxels=1.0, mu_taubin=3,
        ))
        assert n == 256
        assert k["triangulator"] == "lewiner33"
        assert k["refine_steps"] == 0 and k["taubin_iters"] == 0
        assert k["cap_signing"] == "anchor"
        assert k["cap_face_prune_voxels"] is None and k["cap_taubin"] == 0
        assert k["mu_face_prune_voxels"] is None and k["mu_taubin"] == 0

    def test_parity_keeps_explicit_triangulator(self):
        from diffudf_tpu.cli.generate_mc import resolve_quality

        _, k = resolve_quality("parity", 64, {"triangulator": "mc33"})
        assert k["triangulator"] == "mc33"

    def test_enhanced_raises_resolution_only(self):
        from diffudf_tpu.cli.generate_mc import resolve_quality

        n, k = resolve_quality("enhanced", 256, dict(
            triangulator=None, refine_steps=0, taubin_iters=0))
        assert n == 385  # min_resolution floor
        assert k["refine_steps"] == 2 and k["taubin_iters"] == 10
        n2, _ = resolve_quality("enhanced", 512, {})
        assert n2 == 512  # never lowers an explicit higher N

    def test_config_round_trip(self):
        d = TrainConfig.from_dict({"quality": "enhanced"}).to_dict()
        assert d["quality"] == "enhanced"
        assert TrainConfig.from_dict({}).quality == "default"

    def test_config_rejects_bad_quality_at_parse(self):
        """A preset typo fails at config parse, not after the 3000-epoch
        training run (run_mc would otherwise be the first to notice)."""
        with pytest.raises(ValueError, match="quality"):
            TrainConfig.from_dict({"quality": "enhaced"})

    def test_preset_names_in_sync(self):
        from diffudf_tpu.cli.generate_mc import QUALITY_PRESETS
        from diffudf_tpu.config import QUALITY_NAMES

        assert set(QUALITY_PRESETS) == set(QUALITY_NAMES)

    def test_run_mc_parity_smoke(self, trained_dir, tmp_path):
        """quality='parity' plumbs through a real (tiny) extraction."""
        from diffudf_tpu.cli.generate_mc import run_mc

        _, _, state = trained_dir
        from diffudf_tpu.fields.siren import SirenSpec

        spec = SirenSpec(hidden=(32, 32))
        m = run_mc(state.best_params, spec, "tanh", 24,
                   str(tmp_path / "m.obj"), alpha=10, algorithm="cap",
                   quality="parity")
        assert len(m.faces) > 0


class TestGenerateDF:
    def test_slice_figure_files(self, trained_dir, demo_dir, tmp_path):
        from diffudf_tpu.cli.generate_df import generate_df

        out, _, _ = trained_dir
        opts = {
            "hidden_layer_nodes": [32, 32], "weight0": 30, "width": 64,
            "gt_mode": "tanh", "alpha": 10, "surf_thresh": 1e-3,
        }
        outdir = str(tmp_path) + "/"
        generate_df(str(out / "models" / "model_best.npz"),
                    str(demo_dir / "torus_t.obj"), outdir, opts)
        assert os.path.exists(outdir + "distance_fields.png")
        assert os.path.exists(outdir + "pred_grad.png")

    def test_gt_plane_sampler_table_matches_exact(self, demo_dir):
        """Slice-plane GT via the mesh sampler's candidate table == the
        pruned exact point-triangle sweep.  (pc mode deliberately keeps
        the brute sweep — its candidate table has no off-surface
        exactness guarantee; the sampler path must be a no-op there.)"""
        import numpy as np

        from diffudf_tpu.cli.train import build_sampler, gt_plane_distances
        from diffudf_tpu.config import TrainConfig

        cfg = TrainConfig(dataset=str(demo_dir / "torus"), only_pcloud=False)
        sampler, pc, mesh = build_sampler(cfg)
        d_table = gt_plane_distances(cfg, pc, mesh, 32, sampler=sampler)
        d_exact = gt_plane_distances(cfg, pc, mesh, 32)
        np.testing.assert_allclose(d_table, d_exact, atol=1e-5)

        cfg_pc = TrainConfig(dataset=str(demo_dir / "torus"), only_pcloud=True)
        sampler_pc, pc2, _ = build_sampler(cfg_pc)
        d_tbl = gt_plane_distances(cfg_pc, pc2, None, 32, sampler=sampler_pc)
        d_brute = gt_plane_distances(cfg_pc, pc2, None, 32)
        np.testing.assert_array_equal(d_tbl, d_brute)


class TestResume:
    def test_resume_continues(self, demo_dir):
        import dataclasses

        from diffudf_tpu.cli.train import setup_train

        base = {
            "num_epochs": 20, "s1_epochs": 40, "warmup_epochs": 0,
            "dataset": str(demo_dir / "torus"), "batch_size": 192,
            "sampling_percentiles": [0.333, 0.666], "batches_per_epoch": 1,
            "checkpoint_path": str(demo_dir / "res_resume"), "experiment_name": "e",
            "epochs_to_checkpoint": 0, "gt_mode": "tanh",
            "loss_s1_weights": [1e4, 1e4, 1e4, 1e3], "loss_s2_weights": [1e5, 1e5],
            "alpha": 10,
            "optimizer": {"type": "adam", "lr_s1": 1e-4, "lr_s2": 1e-6},
            "network": {"hidden_layer_nodes": [16, 16], "w0": 30,
                        "pretrained_dict": "None"},
            "resolution": 0,
        }
        cfg1 = TrainConfig.from_dict(base)
        # n_mesh_devices=1 pins a single device: this test is about resume
        # mechanics, not DP, and 192-point batch groups don't divide the
        # 8-device suite mesh (the fallback would RuntimeWarn)
        setup_train(cfg1, make_meshes=False, verbose=False, n_mesh_devices=1)
        state_file = (demo_dir / "res_resume" / "e" / "models" / "train_state.npz")
        assert state_file.exists()
        import numpy as np

        epoch_before = int(np.load(state_file)["epoch"])
        assert epoch_before == 20
        # extend the schedule and resume
        cfg2 = TrainConfig.from_dict({**base, "num_epochs": 30})
        t, _, st = setup_train(cfg2, make_meshes=False, verbose=False,
                               resume=True, n_mesh_devices=1)
        epoch_after = int(np.load(state_file)["epoch"])
        assert epoch_after == 30


class TestMeshFlag:
    def test_setup_train_dp_mesh(self, demo_dir):
        """--mesh N path: setup_train over the 8-device CPU mesh trains and
        writes the same artifacts as the single-device path."""
        from diffudf_tpu.cli.train import setup_train

        cfg = TrainConfig.from_dict({
            "num_epochs": 20, "s1_epochs": 16, "warmup_epochs": 0,
            "dataset": str(demo_dir / "torus"),
            "only_pcloud": True,
            # groups 512/512/512 divide 8 -> shard_map fast path
            "batch_size": 1600, "sampling_percentiles": [0.32, 0.64],
            "batches_per_epoch": 1,
            "checkpoint_path": str(demo_dir / "results"),
            "experiment_name": "exp_dp",
            "epochs_to_checkpoint": 0, "gt_mode": "tanh",
            "loss_s1_weights": [1e4, 1e4, 1e4, 1e3],
            "loss_s2_weights": [1e5, 1e5], "alpha": 10,
            "optimizer": {"type": "adam", "lr_s1": 1e-4, "lr_s2": 1e-6},
            "network": {"hidden_layer_nodes": [16], "w0": 30,
                        "pretrained_dict": "None"},
            "resolution": 0,
        })
        t, meshes, state = setup_train(cfg, verbose=False, n_mesh_devices=8)
        out = demo_dir / "results" / "exp_dp"
        assert (out / "models" / "model_best.npz").exists()
        losses = np.genfromtxt(out / "losses.csv", delimiter=";", names=True)
        assert np.isfinite(losses["total"]).all()


class TestSirenMode:
    def test_siren_gt_mode_end_to_end(self, demo_dir):
        """gt_mode='siren': signed-SDF training + signed-MC extraction."""
        from diffudf_tpu.cli.train import setup_train

        cfg = TrainConfig.from_dict({
            "num_epochs": 40, "s1_epochs": 40, "warmup_epochs": 5,
            "dataset": str(demo_dir / "torus"), "batch_size": 256,
            "sampling_percentiles": [0.333, 0.666], "batches_per_epoch": 1,
            "checkpoint_path": str(demo_dir / "res_siren"), "experiment_name": "s",
            "epochs_to_checkpoint": 0, "gt_mode": "siren",
            "loss_weights": [3e3, 1e2, 1e2, 5e1],
            "alpha": 1,
            "optimizer": {"type": "adam", "lr": 1e-4, "lr_s1": 1e-4, "lr_s2": 1e-6},
            "network": {"hidden_layer_nodes": [24, 24], "w0": 30,
                        "pretrained_dict": "None"},
            "resolution": 20,
        })
        # single device: 256-point batch groups don't divide the 8-device
        # suite mesh (the DP fallback would RuntimeWarn; DP has its own test)
        t, mesh, state = setup_train(cfg, verbose=False, n_mesh_devices=1)
        out = demo_dir / "res_siren" / "s"
        assert (out / "reconstructions" / "mc_mesh_best.obj").exists()
        # signed MC of a siren SDF: single mesh artifact (not _MU/_CAP)
        assert mesh is not None
        header = open(out / "losses.csv").readline()
        assert "normal_constraint" in header
