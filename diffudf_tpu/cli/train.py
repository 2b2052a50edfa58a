"""CLI: train a DUDF field from a preprocessed mesh / point cloud.

Reference-compatible surface (``train.py:450-467``):

    python -m diffudf_tpu.cli.train <config.json> [device_ordinal]

Full pipeline parity with ``setup_train`` (``train.py:285-448``): output dirs
+ params.json provenance, dataset build, staged training, per-chunk
checkpoints (best / current / periodic), losses.csv, final model, slice
diagnostics and final marching-cubes reconstructions.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import time

import numpy as np

from ..config import TrainConfig
from ..data.mesh_io import load_mesh, load_point_cloud, save_mesh, Mesh
from ..data.mesh_distance import (
    point_cloud_distance,
    point_triangle_distance_pruned,
    triangles_from_mesh,
)
from ..data.sampling import TrainingSampler
from ..grid.slices import plane_samples, predicted_slice, render_slice_figure
from ..train.loop import Trainer
from ..train import checkpoint as ckpt


def build_sampler(cfg: TrainConfig):
    """Load `<dataset>_pc.ply` (+ `<dataset>_t.obj` in mesh mode).

    The one-shot candidate-grid oracle build is cached on disk next to the
    preprocessed asset (``<dataset>_oracle_cache.npz``, content-hashed —
    see :mod:`..data.oracle_cache`): the host cKDTree build is the dominant
    non-train phase and is identical across retrains of the same asset.
    Set ``DIFFUDF_ORACLE_CACHE=0`` to disable.
    """
    cache = cfg.dataset + "_oracle_cache.npz"
    if os.environ.get("DIFFUDF_ORACLE_CACHE", "1") == "0":
        cache = None
    pc = load_point_cloud(cfg.dataset + "_pc.ply")
    if pc.normals is None:
        raise ValueError(f"{cfg.dataset}_pc.ply has no normals")
    if cfg.only_pcloud:
        sampler = TrainingSampler.from_point_cloud(
            pc.points, pc.normals, cfg.batch_size, cfg.sampling_percentiles,
            cache_path=cache,
        )
        mesh = None
    else:
        mesh = load_mesh(cfg.dataset + "_t.obj")
        tris = mesh.vertices[mesh.faces]
        sampler = TrainingSampler.from_mesh(
            pc.points, pc.normals, tris, cfg.batch_size, cfg.sampling_percentiles,
            cache_path=cache,
        )
    return sampler, pc, mesh


def build_sampler_overlapped(cfg: TrainConfig):
    """Like :func:`build_sampler`, but the candidate-grid build runs on a
    background host thread while training starts immediately on an exact
    bootstrap oracle (:mod:`..data.async_build`).  Returns
    ``(bootstrap_sampler, pc, mesh, handle)``; pass ``handle.poll`` as
    ``Trainer.run(sampler_update=…)`` to hot-swap the table in."""
    from ..data.async_build import overlapped_mesh_sampler, overlapped_pc_sampler

    cache = cfg.dataset + "_oracle_cache.npz"
    if os.environ.get("DIFFUDF_ORACLE_CACHE", "1") == "0":
        cache = None
    pc = load_point_cloud(cfg.dataset + "_pc.ply")
    if pc.normals is None:
        raise ValueError(f"{cfg.dataset}_pc.ply has no normals")
    if cfg.only_pcloud:
        sampler, handle = overlapped_pc_sampler(
            pc.points, pc.normals, cfg.batch_size, cfg.sampling_percentiles,
            cache_path=cache,
        )
        mesh = None
    else:
        mesh = load_mesh(cfg.dataset + "_t.obj")
        tris = mesh.vertices[mesh.faces]
        sampler, handle = overlapped_mesh_sampler(
            pc.points, pc.normals, tris, cfg.batch_size,
            cfg.sampling_percentiles, cache_path=cache,
        )
    return sampler, pc, mesh, handle


def gt_plane_distances(cfg: TrainConfig, pc, mesh, width: int,
                       sampler=None) -> np.ndarray:
    """Unsigned GT distances on the x=0 slice plane (for the figure).

    When the mesh-mode training sampler is passed, its coordinate-table
    oracle answers the plane queries directly (the pruned one-shot sweep
    costs ~5 s/shape on the beetle; the table gather is milliseconds and
    uses the identical candidate sets the training GT used — near-exact,
    i.e. the same exact-on-candidates guarantee class as the training
    oracle, pinned at width 32 / atol 1e-5 on the torus in test_cli).
    The pc-mode candidate table is NOT reused here: it has no
    off-surface exactness guarantee (measured up to 1.6e-2 plane error on
    a 100k cloud), so pc mode keeps the brute nearest-point sweep."""
    samples = plane_samples(width)
    if sampler is not None and getattr(sampler, "tri_table", None) is not None:
        from ..data.mesh_distance import point_triangle_distance_table
        import jax.numpy as jnp

        d = point_triangle_distance_table(
            jnp.asarray(samples), sampler.tri_table
        )
    elif mesh is not None:
        d = point_triangle_distance_pruned(
            samples, triangles_from_mesh(mesh.vertices, mesh.faces)
        )
    else:
        # pc mode: reference uses a KDTree over the full normalized cloud
        # (generate_df.py:205-206); brute-force on device here
        d = point_cloud_distance(samples, np.asarray(pc.points, np.float32))
    return np.abs(np.asarray(d))


def generate_final_meshes(params, spec, cfg: TrainConfig, out_dir: str, mesh_ctx=None):
    """Final reconstruction(s), reference naming (``train.py:430-448``)."""
    from .generate_mc import run_mc

    algorithm = "both" if cfg.gt_mode == "tanh" else "siren"
    return run_mc(
        params, spec, cfg.gt_mode, cfg.resolution,
        osp.join(out_dir, "mc_mesh_best.obj"), cfg.alpha, algorithm,
        quality=cfg.quality,
    )


def setup_train(cfg: TrainConfig, make_meshes: bool = True, verbose: bool = True,
                resume: bool = False, n_mesh_devices: int = 0,
                overlap_oracle: bool | None = None):
    """Programmatic entry (the ``cuantitative`` driver uses this too).

    ``resume=True`` continues an interrupted run from
    ``models/train_state.npz`` (params + optimizer state + epoch — exact
    mid-run resume, a capability the reference lacks).

    ``n_mesh_devices >= 1`` trains data-parallel over a 1-D mesh of exactly
    the first N devices (params replicated, per-device sampling, gradient
    psum over ICI); ``n_mesh_devices=1`` pins a true single-device run.
    ``0`` (default) uses all visible devices.  Batch groups that don't
    divide the mesh fall back to a slower constrained-sharding step (with
    a RuntimeWarning).

    ``overlap_oracle`` (default: on unless ``DIFFUDF_ORACLE_OVERLAP=0``)
    runs the host candidate-grid build on a background thread behind the
    first training chunks (exact bootstrap oracle, hot-swap at a chunk
    boundary — :mod:`..data.async_build`).

    Returns ``(training_time_seconds, meshes, state)``.
    ``training_time_seconds`` counts everything from sampler construction
    through the last train chunk — INCLUDING the GT-oracle build (however
    much of it the overlap failed to hide) and stage compile waits —
    minus per-chunk callback work (checkpoint writes / periodic recon),
    mirroring the reference's accounting, which pays GT queries inside
    the timed epoch loop but subtracts reconstruction time
    (``train.py:171-172,195-202,277-281``).  ``meshes`` is the final
    mesh, a ``(meshMU, meshCAP)`` pair, or None (make_meshes off / siren
    mode), and ``state`` is the final TrainState.
    """
    full_path = ckpt.create_output_paths(cfg.checkpoint_path, cfg.experiment_name)
    with open(osp.join(full_path, "params.json"), "w") as fh:
        json.dump(cfg.to_dict(), fh, indent=4)

    if overlap_oracle is None:
        overlap_oracle = os.environ.get("DIFFUDF_ORACLE_OVERLAP", "1") != "0"
    t_pipeline = time.perf_counter()
    handle = None
    if overlap_oracle:
        sampler, pc, mesh, handle = build_sampler_overlapped(cfg)
    else:
        sampler, pc, mesh = build_sampler(cfg)
    spec = cfg.network.to_spec()

    device_mesh = None
    if n_mesh_devices and n_mesh_devices >= 1:
        from ..parallel.mesh import data_mesh

        device_mesh = data_mesh(n_mesh_devices)
    trainer = Trainer(spec, sampler, cfg, mesh=device_mesh)
    state = trainer.init_state()
    start_epoch = 0
    resume_path = osp.join(full_path, "models", "train_state.npz")
    if resume and osp.exists(resume_path):
        params, opt_state, start_epoch, key = ckpt.load_train_state(
            resume_path, state.params, state.opt_state
        )
        state.params = params
        state.opt_state = opt_state
        state.key = key
        best_path = osp.join(full_path, "models", "model_best.npz")
        if osp.exists(best_path):
            state.best_params = ckpt.load_params(best_path)
        if verbose:
            print(f"Resuming from epoch {start_epoch}")
    elif cfg.network.pretrained_dict not in (None, "None", ""):
        state.params = ckpt.load_params(cfg.network.pretrained_dict)
        state.best_params = state.params

    models_dir = osp.join(full_path, "models")
    recon_dir = osp.join(full_path, "reconstructions")

    from ..utils.metrics import ScalarLogger

    logger = ScalarLogger(full_path)

    def on_chunk(epoch_end, st, logs):
        start = epoch_end - len(logs["epoch_loss"])
        for name, vals in logs.items():
            logger.log_array(name, start, vals)
        ckpt.save_params(osp.join(models_dir, "model_current.npz"), st.params, spec)
        ckpt.save_params(osp.join(models_dir, "model_best.npz"), st.best_params, spec)
        ckpt.save_train_state(
            osp.join(models_dir, "train_state.npz"),
            st.params, st.opt_state, epoch_end, st.key,
        )
        if cfg.epochs_to_checkpoint and epoch_end % cfg.epochs_to_checkpoint == 0 \
                and epoch_end < cfg.num_epochs:
            ckpt.save_params(
                osp.join(models_dir, f"model_{epoch_end}.npz"), st.params, spec
            )
            if cfg.resolution:
                # periodic reconstruction (reference ``train.py:252-269``);
                # runs in the callback, so it is excluded from train_time
                from .generate_mc import run_mc

                if verbose:
                    print("Generating mesh")
                run_mc(
                    st.params, spec, cfg.gt_mode, cfg.resolution,
                    osp.join(recon_dir, f"mc_mesh_{epoch_end}.obj"),
                    cfg.alpha,
                    "both" if cfg.gt_mode == "tanh" else "siren",
                    quality=cfg.quality,
                )
        if verbose:
            print(
                f"Epoch: {epoch_end} - Loss: {float(logs['epoch_loss'][-1]):.6f}"
                f" - Learning Rate: {float(logs['lr'][-1]):.3e}"
            )

    state, losses, train_time = trainer.run(
        state=state, start_epoch=start_epoch, callback=on_chunk,
        sampler_update=handle.poll if handle is not None else None,
    )
    # GT-build-inclusive wall (reference-equivalent accounting, see
    # docstring); the chunk-only device time stays available as train_time
    pipeline_time = time.perf_counter() - t_pipeline - trainer.callback_seconds
    if handle is not None:
        # the trainer may have swapped mid-run; downstream consumers
        # (slice-plane GT) should see the upgraded sampler when available
        sampler = trainer.sampler
        late = handle.poll()
        if late is not None:
            sampler = late
        if verbose:
            if trainer.last_swap_epoch is not None:
                print(
                    f"GT oracle table swapped in at epoch "
                    f"{trainer.last_swap_epoch} (build "
                    f"{handle.build_seconds:.1f}s, hidden behind training)"
                )
            elif handle.build_seconds is not None:
                print(
                    f"GT oracle build ({handle.build_seconds:.1f}s) outlasted "
                    f"training; run completed on the exact bootstrap oracle"
                )

    # losses.csv (reference ``train.py:394-395``; ';' separator) + TensorBoard
    logger.flush_csv("losses.csv", exclude=("lr", "epoch_loss"))
    logger.close()

    ckpt.save_params(osp.join(models_dir, "model_final.npz"), state.params, spec)

    if verbose:
        print("Generating distance field slices")
    width = 512
    pred = predicted_slice(state.best_params, spec, width)
    gt_d = gt_plane_distances(cfg, pc, mesh, width, sampler=sampler)
    render_slice_figure(pred, gt_d, cfg.gt_mode, cfg.alpha, width, recon_dir)

    meshes = None
    if make_meshes and cfg.resolution:
        if verbose:
            print("Generating mesh")
        meshes = generate_final_meshes(state.best_params, spec, cfg, recon_dir)
    return pipeline_time, meshes, state


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(
        usage="python -m diffudf_tpu.cli.train path_to_experiment.json [device]"
    )
    parser.add_argument("experiment_path", type=str)
    parser.add_argument("device", type=int, nargs="?", default=0,
                        help="accepted for reference-CLI parity; devices are "
                             "managed by JAX")
    parser.add_argument("--resume", action="store_true",
                        help="continue from models/train_state.npz")
    parser.add_argument("--mesh", type=int, default=0, metavar="N",
                        help="data-parallel training over exactly the first "
                             "N devices (1-D jax mesh; batch groups should "
                             "divide N; N=1 pins one device). Default: all "
                             "visible devices.")
    args = parser.parse_args(argv)
    cfg = TrainConfig.from_json(args.experiment_path)
    t, _, _ = setup_train(cfg, resume=args.resume, n_mesh_devices=args.mesh)
    print(f"Training time (incl. GT-oracle build): {t:.1f}s")


if __name__ == "__main__":
    main()
