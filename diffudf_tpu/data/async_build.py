"""Background GT-oracle builds overlapped with device training.

The candidate-grid build (host cKDTree, ~8-50 s depending on geometry —
the dominant non-train phase, ``results/BEETLE_phase_profile.json``) is
pure host work, while training is pure device work dispatched from a
mostly-idle host loop.  The reference pays the equivalent GT-oracle cost
*inside* its timed epoch loop (``train.py:195-202`` → Open3D scene queries
every step, ``src/dataset.py:35-50``); rebuilding it as an untimed
pre-train phase would be asymmetric accounting — so instead the build is
HIDDEN behind the device time:

  1. training starts immediately on an exact *bootstrap* oracle
     (``TrainingSampler.from_mesh_bootstrap`` — the pruned top-k sweep —
     or ``from_point_cloud_bootstrap`` — the brute nearest-point sweep);
  2. a daemon thread runs the numpy/cKDTree candidate-grid build
     (the ``*_host`` entry points of :mod:`.oracle_cache` — NO device
     traffic from the thread);
  3. the trainer polls the handle at compiled-chunk boundaries
     (``Trainer.run(sampler_update=…)``) and hot-swaps the upgraded
     sampler in: the sampler is a jit *argument*, so the swap is just a
     new pytree structure (one cached executable, shared across shapes).

Determinism: both bootstrap oracles are exact, and the candidate-grid
oracles they hand over to are exact-on-candidates with validated
near-exactness — so WHEN the swap lands does not change the GT stream
beyond that guarantee class (f32 association at worst in mesh mode; the
documented ≤3.3e-3-on-2%-of-far-queries band in pc mode).  Set
``DIFFUDF_ORACLE_OVERLAP=0`` to restore the strict build-then-train
ordering.

A failed background build degrades to a RuntimeWarning and the run
finishes on the bootstrap oracle — correct, just slower per step.
"""

from __future__ import annotations

import threading
import time
import warnings


class OracleBuildHandle:
    """Handle to one background oracle build.

    ``poll()`` (main thread) returns the upgraded sampler exactly once,
    as soon as the build thread has finished; ``None`` while pending,
    after the single handover, or if the build failed (warned once).
    ``wait()`` blocks (used by the strict non-overlapped path and tests).
    """

    def __init__(self, build_fn, upgrade_fn):
        """``build_fn() -> host result`` runs on the thread (numpy only);
        ``upgrade_fn(host_result) -> TrainingSampler`` runs on the main
        thread at handover (device placement happens here)."""
        self._upgrade_fn = upgrade_fn
        self._result = None
        self._exc = None
        self._done = threading.Event()
        self.build_seconds: float | None = None  # thread wall time
        self.swap_epoch: int | None = None  # set by Trainer.run at swap

        def run():
            t0 = time.perf_counter()
            try:
                self._result = build_fn()
            except BaseException as e:  # surfaced as a warning on poll
                self._exc = e
            finally:
                self.build_seconds = time.perf_counter() - t0
                self._done.set()

        self._thread = threading.Thread(
            target=run, name="oracle-build", daemon=True
        )
        self._thread.start()

    @property
    def done(self) -> bool:
        return self._done.is_set()

    def poll(self):
        if not self._done.is_set():
            return None
        if self._exc is not None:
            warnings.warn(
                f"background oracle build failed ({self._exc!r}); training "
                f"continues on the exact bootstrap oracle (slower per step)",
                RuntimeWarning,
            )
            self._exc = None
            return None
        if self._result is None:
            return None
        result, self._result = self._result, None
        return self._upgrade_fn(result)

    def wait(self, timeout: float | None = None):
        """Block until the build finishes, then hand over (or None)."""
        self._done.wait(timeout)
        return self.poll()


# Largest padded triangle bucket the FLAT bootstrap sweep may run on.
# Its fused elementwise chain holds O(Q·T) f32 temps; at the 30k-point
# recipe (Q=20k off-surface queries) the 16384 bucket peaks ~1.3 GB/temp
# and fits v5e HBM, while the next bucket (65536 — e.g. the 36k-face demo
# skirt) OOMs the chip (measured: RESOURCE_EXHAUSTED mid-sweep).  Above
# the cap the build runs synchronously instead — it is seconds at any
# scale (``build_candidate_grid``) and the accounting includes it either
# way, so only the few-second overlap win is forfeited.
BOOT_TRI_MAX = 16384


def overlapped_mesh_sampler(points, normals, tri_verts, batch_size,
                            percentiles, stddev=0.01,
                            cache_path: str | None = None):
    """(bootstrap sampler, handle) for mesh mode: training can start now;
    the coordinate-table sampler arrives via ``handle.poll()``.

    For meshes whose padded triangle bucket exceeds ``BOOT_TRI_MAX`` the
    bootstrap sweep cannot run (HBM), so the candidate-grid build happens
    HERE, synchronously, and the returned handle is ``None`` — the caller
    gets the final table sampler directly (build-then-train)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from ..utils.buckets import next_bucket
    from .mesh_distance import build_triangle_table
    from .oracle_cache import cached_candidate_grid_host
    from .sampling import TrainingSampler

    real = np.asarray(tri_verts, np.float32)
    if next_bucket(len(real), TrainingSampler.BOOT_TRI_BUCKET) > BOOT_TRI_MAX:
        sampler = TrainingSampler.from_mesh(
            points, normals, real, batch_size, percentiles, stddev,
            cache_path=cache_path,
        )
        return sampler, None
    boot = TrainingSampler.from_mesh_bootstrap(
        points, normals, real, batch_size, percentiles, stddev
    )

    def build():
        return cached_candidate_grid_host(real, cache_path)

    def upgrade(cand_np):
        cand = jnp.asarray(cand_np)
        table = build_triangle_table(jnp.asarray(real), cand)
        return dataclasses.replace(
            boot, tri_verts=None, tri_candidates=None, tri_table=table
        )

    return boot, OracleBuildHandle(build, upgrade)


def overlapped_pc_sampler(points, normals, batch_size, percentiles,
                          stddev=0.01, cache_path: str | None = None):
    """(bootstrap sampler, handle) for pc mode."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from .oracle_cache import cached_point_candidate_idx_host
    from .sampling import TrainingSampler

    pts = np.asarray(points, np.float32)
    boot = TrainingSampler.from_point_cloud_bootstrap(
        pts, normals, batch_size, percentiles, stddev
    )

    def build():
        return cached_point_candidate_idx_host(pts, cache_path)

    def upgrade(idx):
        return dataclasses.replace(boot, pc_candidates=jnp.asarray(pts[idx]))

    return boot, OracleBuildHandle(build, upgrade)
