"""The training loop: on-device epoch scan, data-parallel over the mesh.

Architecture (vs. reference ``train.py:146-283``):

  * One *epoch* = ``batches_per_epoch`` (sample → loss → grad → Adam) updates,
    exactly the reference accounting; but epochs run in compiled *chunks* — a
    ``lax.scan`` over epoch indices inside a single jit, so 3000 epochs cost a
    handful of dispatches instead of 3000 Python iterations with host-side
    sampling.
  * The batch is sampled on device inside the step (see data/sampling.py) and
    sharded across the ``data`` mesh axis; params stay replicated, XLA emits
    the gradient ``psum`` over ICI.
  * Best-epoch tracking lives in the scan carry (a second copy of the tiny
    param pytree), replacing the reference's per-epoch host ``deepcopy`` +
    ``torch.save`` (``train.py:244-250``).
  * Learning rate & stage schedule are computed on device from the epoch
    index (train/schedule.py); chunks are aligned so a chunk never straddles
    the s1→s2 boundary (different loss graph ⇒ different compiled fn).

Optimizer: Adam with torch-default hyperparameters (β=(0.9, 0.999), ε=1e-8)
via ``optax.scale_by_adam``; the learning rate multiplies the preconditioned
update per step so schedules don't rebuild the optimizer.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TrainConfig
from ..data.sampling import TrainingSampler
from ..fields.siren import SirenSpec, init_siren
from ..parallel.mesh import data_mesh
from .losses import loss_s1, loss_s2, loss_siren
from .schedule import lr_for_epoch, lr_for_epoch_siren


@dataclasses.dataclass
class TrainState:
    params: list
    opt_state: tuple
    best_loss: jax.Array  # scalar f32
    best_params: list
    key: jax.Array


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=["params", "opt_state", "best_loss", "best_params", "key"],
    meta_fields=[],
)


# process-wide compiled-chunk table (see Trainer._chunk_cache_key)
_SHARED_CHUNK_FNS: dict = {}


class Trainer:
    """Builds and runs compiled epoch chunks for one experiment."""

    def __init__(
        self,
        spec: SirenSpec,
        sampler: TrainingSampler,
        cfg: TrainConfig,
        mesh=None,
    ):
        self.spec = spec
        self.sampler = sampler
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else data_mesh()
        self.optim = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        self._vgh_op = None
        self._vg_op = None
        # Pallas fused ops run per shard under shard_map, so any mesh size
        # keeps the single-chip fast path (round-1 lost it under a mesh).
        if (
            cfg.use_pallas
            and jax.default_backend() == "tpu"
            and spec.activation == "sine"
            and len(set(spec.hidden)) == 1
        ):
            from ..ops.pallas_vg import make_vg_op
            from ..ops.pallas_vgh_vjp import make_vgh_op

            # the kernels stay f32: measured on v5e, bf16 MXU inputs change
            # throughput by <1% (the rounds are not matmul-input bound) and
            # only cost precision — the compute_dtype knob remains available
            # on make_vgh_op/make_vg_op for other architectures
            self._vgh_op = make_vgh_op(spec)
            self._vg_op = make_vg_op(spec)

    # --- state ---------------------------------------------------------------

    def init_state(self, key=None, params=None) -> TrainState:
        if key is None:
            key = jax.random.PRNGKey(self.cfg.seed)
        if params is None:
            key, sub = jax.random.split(key)
            params = init_siren(sub, self.spec)
        opt_state = self.optim.init(params)
        return TrainState(
            params=params,
            opt_state=opt_state,
            best_loss=jnp.asarray(np.inf, jnp.float32),
            best_params=jax.tree.map(jnp.copy, params),
            key=key,
        )

    # --- stage plumbing ------------------------------------------------------

    def _loss_terms(self, stage, params, points, normals, sdf,
                    n_surface=None, axis_name=None):
        """Loss terms on one (local) batch.  ``n_surface`` = static count of
        leading on-surface rows enabling the split Hessian path; under the
        shard_map DP step it is the per-shard count and ``axis_name`` names
        the mesh axis for the s2 sufficient statistics."""
        cfg = self.cfg
        dd = jnp.dtype(cfg.deriv_dtype) if cfg.deriv_dtype else None
        if stage == "s1":
            return loss_s1(params, self.spec, points, normals, sdf,
                           cfg.loss_s1_weights, cfg.alpha, deriv_dtype=dd,
                           n_surface=n_surface,
                           vgh_fn=self._vgh_op, vg_fn=self._vg_op)
        if stage == "s2":
            return loss_s2(params, self.spec, points, normals, sdf,
                           cfg.loss_s2_weights, cfg.alpha, axis_name=axis_name)
        if stage == "siren":
            return loss_siren(params, self.spec, points, normals, sdf,
                              cfg.loss_weights, deriv_dtype=dd)
        raise ValueError(stage)

    def _lr(self, stage, epoch):
        cfg = self.cfg
        if stage == "siren":
            return lr_for_epoch_siren(
                epoch, warmup_epochs=cfg.warmup_epochs,
                warmup_lr=cfg.warmup_lr, lr=cfg.lr,
            )
        return lr_for_epoch(
            epoch,
            num_epochs=cfg.num_epochs, s1_epochs=cfg.s1_epochs,
            warmup_epochs=cfg.warmup_epochs, warmup_lr=cfg.warmup_lr,
            lr_s1=cfg.lr_s1, lr_s2=cfg.lr_s2,
        )

    def stage_for_epoch(self, epoch: int) -> str:
        if self.cfg.gt_mode == "siren":
            return "siren"
        return "s1" if epoch < self.cfg.s1_epochs else "s2"

    def stage_boundaries(self):
        """Epoch indices where the compiled loss graph changes."""
        if self.cfg.gt_mode == "siren":
            return []
        return [self.cfg.s1_epochs]

    # --- compiled chunk ------------------------------------------------------

    def _build_chunk_fn(self, stage: str):
        """Compiled chunk: ``fn(state, sampler, epoch_indices) -> (state, logs)``.

        Two properties keep the whole run at ~one XLA compile per stage:

          * ``epoch_indices`` always has the same (padded) length — entries
            of ``-1`` are masked no-ops (state passes through, logs are
            NaN), so stage/checkpoint boundaries never mint new scan
            lengths (each one used to cost a fresh 20-40 s remote compile);
          * the sampler is an *argument* (arrays are runtime inputs), not a
            closure constant — the traced HLO is byte-identical across
            shapes with the same batch/cloud/triangle sizes, so the
            persistent compilation cache carries compiles across a whole
            ``cli.quantitative`` dataset sweep.
        """
        mesh = self.mesh
        batches = self.cfg.batches_per_epoch

        batch_step = None
        if mesh.size > 1:
            # Data-parallel step as SPMD shard_map: every device samples its
            # own [surf|far|near] sub-batch (zero resharding, balanced
            # semantics) and runs the unmodified single-chip loss — split
            # Hessian rows, Pallas fused ops and all; per-term means are
            # pmean'd so the value matches the single-device step on the
            # union batch.  XLA turns the grad of pmean into the ICI psum.
            try:
                batch_step = self._build_sharded_batch_step(stage)
            except ValueError as exc:
                # batch groups don't divide the mesh: fall back to the
                # masked full-batch loss under a sharding constraint
                # (correct, but loses the split-Hessian fast path)
                import warnings

                warnings.warn(
                    f"{exc} — falling back to the constrained-sharding DP "
                    f"step (correct but slower; pick batch sizes whose "
                    f"[surf|far|near] groups divide the mesh for the fast "
                    f"path)", RuntimeWarning)
                batch_step = self._build_constrained_batch_step(stage)
        if batch_step is None:
            def batch_step(params_opt, sampler, key):
                params, opt_state = params_opt
                pts, nrm, sdf = sampler.sample(key)

                def total_loss(p):
                    terms = self._loss_terms(
                        stage, p, pts, nrm, sdf,
                        n_surface=sampler.static.sizes.on_surface,
                    )
                    return sum(terms.values()), terms

                (tot, terms), grads = jax.value_and_grad(
                    total_loss, has_aux=True
                )(params)
                return (params, opt_state, grads), (tot, terms)

        def chunk(state: TrainState, sampler, epoch_indices: jax.Array):
            def epoch_step(carry, epoch_idx):
                state = carry
                lr = self._lr(stage, epoch_idx)

                def inner(acc, key):
                    params, opt_state, sums = acc
                    (params, opt_state, grads), (tot, terms) = batch_step(
                        (params, opt_state), sampler, key
                    )
                    updates, opt_state = self.optim.update(grads, opt_state, params)
                    params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
                    sums = jax.tree.map(lambda a, b: a + b, sums, {**terms, "total": tot})
                    return (params, opt_state, sums), None

                key, *subkeys = jax.random.split(state.key, batches + 1)
                zero_sums = {
                    **{k: jnp.zeros(()) for k in self._term_names(stage)},
                    "total": jnp.zeros(()),
                }
                (params, opt_state, sums), _ = jax.lax.scan(
                    inner,
                    (state.params, state.opt_state, zero_sums),
                    jnp.stack(subkeys),
                )
                epoch_loss = sums["total"] / batches
                is_best = epoch_loss < state.best_loss
                best_loss = jnp.where(is_best, epoch_loss, state.best_loss)
                best_params = jax.tree.map(
                    lambda new, old: jnp.where(is_best, new, old), params, state.best_params
                )
                new_state = TrainState(params, opt_state, best_loss, best_params, key)
                logs = {**sums, "lr": lr, "epoch_loss": epoch_loss}

                # padded epochs (idx < 0) are no-ops: state passes through
                # untouched, logs are NaN.  They only occur when a stage or
                # checkpoint boundary does not divide the chunk size.
                valid = epoch_idx >= 0
                new_state = jax.tree.map(
                    lambda n, o: jnp.where(valid, n, o), new_state, state
                )
                logs = {k: jnp.where(valid, v, jnp.nan) for k, v in logs.items()}
                return new_state, logs

            return jax.lax.scan(epoch_step, state, epoch_indices)

        return jax.jit(chunk, donate_argnums=(0,))

    def _build_constrained_batch_step(self, stage: str):
        """Legacy DP step: one global sample under a batch-axis sharding
        constraint, masked full-batch Hessian (no leading-rows split — a
        strided slice would reshard across devices)."""
        from ..parallel.mesh import shard_batch

        mesh = self.mesh

        def batch_step(params_opt, sampler, key):
            params, opt_state = params_opt
            pts, nrm, sdf = sampler.sample(key)
            pts = shard_batch(pts, mesh)
            nrm = shard_batch(nrm, mesh)
            sdf = shard_batch(sdf, mesh)

            def total_loss(p):
                terms = self._loss_terms(stage, p, pts, nrm, sdf)
                return sum(terms.values()), terms

            (tot, terms), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
            return (params, opt_state, grads), (tot, terms)

        return batch_step

    def _build_sharded_batch_step(self, stage: str):
        from ..parallel.mesh import DATA_AXIS

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh
        # raises ValueError NOW if the initial sampler's batch groups don't
        # divide the mesh (fail at build, not first dispatch); the traced fn
        # below re-derives the local layout from the *runtime* sampler
        # argument so a compiled chunk honors whatever sampler it is fed —
        # the same sampler-as-argument contract the single-device step keeps
        self.sampler.local(mesh.size)

        def local_terms(params, sampler, keys):
            local_sampler = sampler.local(mesh.size)  # static: trace-time
            pts, nrm, sdf = local_sampler.sample(keys[0])
            terms = self._loss_terms(
                stage, params, pts, nrm, sdf,
                n_surface=local_sampler.static.sizes.on_surface,
                axis_name=DATA_AXIS)
            # every s1/siren term is a local-batch mean over equal-size
            # shards; s2 already psums its statistics internally
            if stage != "s2":
                terms = {k: jax.lax.pmean(v, DATA_AXIS) for k, v in terms.items()}
            return terms

        sharded_terms = shard_map(
            local_terms, mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS)), out_specs=P(),
        )

        def batch_step(params_opt, sampler, key):
            params, opt_state = params_opt
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(mesh.size)
            )

            def total_loss(p):
                terms = sharded_terms(p, sampler, keys)
                return sum(terms.values()), terms

            (tot, terms), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
            return (params, opt_state, grads), (tot, terms)

        return batch_step

    def _chunk_cache_key(self, stage: str):
        """Everything the compiled chunk closure traces as a CONSTANT.

        Chunk executables are shared across Trainer instances (sweeps
        build one Trainer per shape): the sampler is a jit *argument*, so
        two shapes with the same config family produce byte-identical
        programs — but a fresh ``jax.jit`` object per Trainer would
        re-enter the compile/lookup path per shape, which on the remote
        platform costs a 20-380 s service round-trip even on a local
        persistent-cache hit (measured round 5).  Module-level sharing
        makes repeat dispatch a C++ fast-path hit instead.
        """
        cfg = self.cfg
        if self.mesh.size > 1:
            # the DP step IMPLEMENTATION (shard_map fast path vs the
            # constrained-sharding fallback) is chosen at build time from
            # the initial sampler's divisibility — key on it so a
            # non-divisible Trainer never reuses a shard_map executable
            try:
                self.sampler.local(self.mesh.size)
                divisible = True
            except ValueError:
                divisible = False
        else:
            divisible = True
        return (
            self.spec, stage, divisible,
            tuple(d.id for d in self.mesh.devices.flat), self.mesh.axis_names,
            cfg.batches_per_epoch, cfg.gt_mode, cfg.alpha,
            tuple(cfg.loss_s1_weights), tuple(cfg.loss_s2_weights),
            tuple(cfg.loss_weights),
            cfg.num_epochs, cfg.s1_epochs, cfg.warmup_epochs,
            cfg.warmup_lr, cfg.lr_s1, cfg.lr_s2, cfg.lr,
            cfg.deriv_dtype, self._vgh_op is not None,
            self._vg_op is not None,
        )

    def _term_names(self, stage):
        if stage == "s1":
            return ("sdf_on_surf", "sdf_off_surf", "hessian_constraint", "grad_constraint")
        if stage == "s2":
            return ("sdf_on_surf", "std_on_surf")
        return ("sdf_on_surf", "sdf_off_surf", "normal_constraint", "grad_constraint")

    def chunk_fn(self, stage: str):
        key = self._chunk_cache_key(stage)
        fn = _SHARED_CHUNK_FNS.get(key)
        if fn is None:
            fn = _SHARED_CHUNK_FNS[key] = self._build_chunk_fn(stage)
        return fn

    # --- host orchestration --------------------------------------------------

    def run(
        self,
        state: TrainState | None = None,
        start_epoch: int = 0,
        chunk_size: int = 250,
        callback=None,
        sampler_update=None,
    ):
        """Train from ``start_epoch`` to ``num_epochs``.

        ``callback(epoch_end, state, logs)`` fires after every chunk (host
        side) for checkpointing/printing; ``logs`` maps term name -> np array
        of per-epoch values within the chunk.

        ``sampler_update()`` (optional) is polled before every chunk; when
        it returns a sampler, training hot-swaps to it (the sampler is a
        jit argument, so the swap costs one cached-executable lookup) —
        the background-oracle-build handover of :mod:`..data.async_build`.
        The swap epoch is recorded on ``self.last_swap_epoch``.

        Returns (final_state, losses dict of full-length np arrays,
        training_seconds — pure device time, excluding callback work, matching
        the reference's recon-time exclusion, ``train.py:171-172,277-281``).
        Callback wall time is accumulated on ``self.callback_seconds`` so
        pipeline-level accounting can subtract exactly the recon/checkpoint
        work the reference also excludes.
        """
        if state is None:
            state = self.init_state()
        cfg = self.cfg
        self.callback_seconds = 0.0
        self.last_swap_epoch = None

        if 0 < cfg.epochs_to_checkpoint < chunk_size:
            # a checkpoint cadence shorter than the canonical chunk would pad
            # EVERY chunk with fully-computed no-op epochs (masked, not
            # skipped — scan shapes are static); shrink the compiled scan
            # length to the cadence instead — still one executable per run
            chunk_size = cfg.epochs_to_checkpoint

        # chunk boundaries: stage switches + epochs_to_checkpoint + chunk_size
        marks = {cfg.num_epochs}
        for b in self.stage_boundaries():
            if start_epoch < b < cfg.num_epochs:
                marks.add(b)
        if cfg.epochs_to_checkpoint:
            marks.update(
                range(cfg.epochs_to_checkpoint, cfg.num_epochs, cfg.epochs_to_checkpoint)
            )
        e = start_epoch
        edges = []
        while e < cfg.num_epochs:
            nxt = min([m for m in marks if m > e] + [e + chunk_size])
            nxt = min(nxt, e + chunk_size)
            edges.append((e, nxt))
            e = nxt

        all_logs = []
        train_time = 0.0
        for lo, hi in edges:
            if sampler_update is not None:
                new_sampler = sampler_update()
                if new_sampler is not None:
                    self.sampler = new_sampler
                    self.last_swap_epoch = lo
                    sampler_update = None  # one-shot handover
            stage = self.stage_for_epoch(lo)
            fn = self.chunk_fn(stage)
            # every chunk scans exactly `chunk_size` indices — short chunks
            # (stage/checkpoint boundaries, final chunk) are padded with -1
            # no-op epochs so one compiled executable serves every chunk of
            # the stage
            idx = np.full(chunk_size, -1, np.int32)
            idx[: hi - lo] = np.arange(lo, hi, dtype=np.int32)
            t0 = time.perf_counter()
            state, logs = fn(state, self.sampler, jnp.asarray(idx))
            jax.block_until_ready(state.params)
            train_time += time.perf_counter() - t0
            logs = {k: np.asarray(v)[: hi - lo] for k, v in logs.items()}
            all_logs.append((lo, hi, logs))
            if callback is not None:
                t_cb = time.perf_counter()
                callback(hi, state, logs)
                self.callback_seconds += time.perf_counter() - t_cb

        # stitch per-term logs into full arrays (terms differ across stages)
        keys = sorted({k for _, _, lg in all_logs for k in lg})
        losses = {k: np.full(cfg.num_epochs - start_epoch, np.nan) for k in keys}
        for lo, hi, lg in all_logs:
            for k, v in lg.items():
                losses[k][lo - start_epoch : hi - start_epoch] = v
        return state, losses, train_time
