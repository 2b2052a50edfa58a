"""Training batch sampling — fully on-device, inside the jit'd train step.

The reference builds every batch on the host: Open3D BVH queries + numpy
randint + torch normal, then ships it to the GPU (``src/dataset.py:14-131``).
Here the sampler is a pure function of a PRNG key that runs *inside* the
compiled training step: indices via ``jax.random.randint``, GT distances via
the on-device oracles in :mod:`.mesh_distance`.  Zero host↔device traffic per
step.

Batch layout matches the reference contract exactly
(``src/dataset.py:54-70``): rows = [on-surface | far-uniform | near-surface],
normals zero off-surface, sdf column = [0 | oracle(far) | near-offsets].

  * far points: uniform in [-1,1]³, GT = exact-on-candidates point-triangle
    distance via a precomputed cell grid (mesh oracle; unsigned — see the
    documented sign deviation in ``TrainingSampler.sample``, reference
    ``dataset.py:35``) or unsigned nearest-point distance (pc oracle,
    ``dataset.py:103``)
  * near points: surface point + normal · N(0, 0.01) (scalar per point);
    GT = oracle (mesh) or |offset| (pc, ``dataset.py:109-111``)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.buckets import next_bucket
from .mesh_distance import (
    build_triangle_table,
    point_cloud_distance,
    point_cloud_distance_cells,
    point_triangle_distance,
    point_triangle_distance_cells,
    point_triangle_distance_table,
)


def sample_surface_points(mesh, n: int, seed: int = 123):
    """Host-side area-weighted uniform surface sampling with triangle normals.

    Open3D ``sample_points_uniformly(use_triangle_normal=True)`` analogue
    (``src/preprocess_mesh.py:39``). Returns (points (n,3), normals (n,3)).
    """
    rng = np.random.default_rng(seed)
    areas, tri_normals = mesh.face_areas_normals()
    probs = areas / areas.sum()
    tri_idx = rng.choice(len(probs), size=n, p=probs)
    v = mesh.vertices[mesh.faces[tri_idx]]  # (n, 3, 3)
    u1 = rng.random(n)
    u2 = rng.random(n)
    flip = u1 + u2 > 1
    u1 = np.where(flip, 1 - u1, u1)
    u2 = np.where(flip, 1 - u2, u2)
    pts = v[:, 0] + u1[:, None] * (v[:, 1] - v[:, 0]) + u2[:, None] * (v[:, 2] - v[:, 0])
    return pts, tri_normals[tri_idx]


@dataclasses.dataclass(frozen=True)
class BatchSizes:
    on_surface: int
    far: int
    near: int

    @property
    def total(self) -> int:
        return self.on_surface + self.far + self.near

    @classmethod
    def from_config(cls, batch_size: int, percentiles) -> "BatchSizes":
        """Reference split (``src/dataset.py:161-163,27-28``):
        on = int(B·p0); off = int(B·p1); far = off//2; near = off - far."""
        on = int(batch_size * percentiles[0])
        off = int(batch_size * percentiles[1])
        return cls(on_surface=on, far=off // 2, near=off - off // 2)


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True, eq=True)
class SamplerStatic:
    sizes: BatchSizes
    oracle: str  # 'pointcloud' | 'mesh'
    stddev: float = 0.01


@dataclasses.dataclass
class TrainingSampler:
    """Device-resident sampler. ``sample(key)`` is pure & jit-traceable.

    Registered as a pytree (arrays = leaves, static config = metadata) so a
    sampler instance can be passed straight through jit/scan boundaries.
    """

    surface_points: jax.Array  # (N, 3) f32
    surface_normals: jax.Array  # (N, 3) f32
    static: SamplerStatic
    tri_verts: jax.Array | None = None  # (T, 3, 3) for the indices mesh oracle
    tri_candidates: jax.Array | None = None  # (G³, K) per-cell candidates
    tri_table: jax.Array | None = None  # (G³, K·9) per-cell triangle coords
    pc_candidates: jax.Array | None = None  # (G³, K, 3) per-cell point table

    @classmethod
    def from_point_cloud(cls, points, normals, batch_size, percentiles, stddev=0.01,
                         cache_path: str | None = None):
        """``cache_path`` (optional) caches the one-shot candidate-grid
        build on disk, keyed by the cloud bytes (:mod:`.oracle_cache`)."""
        from .oracle_cache import cached_point_candidate_grid

        sizes = BatchSizes.from_config(batch_size, percentiles)
        return cls(
            surface_points=jnp.asarray(points, jnp.float32),
            surface_normals=jnp.asarray(normals, jnp.float32),
            static=SamplerStatic(sizes, "pointcloud", stddev),
            pc_candidates=cached_point_candidate_grid(points, cache_path),
        )

    # all meshes up to this face count share ONE padded triangle-array
    # shape — the per-step oracle only ever gathers k candidates, so the
    # padding costs 4.7 MB of HBM and nothing else, while each distinct
    # shape would cost a fresh multi-minute remote train-step compile
    TRI_PAD_BUCKET = 131072

    # the BOOTSTRAP oracle (exact pruned sweep, no precomputed grid) pays
    # O(T) per step, so it pads to fine factor-2 buckets instead: one
    # compiled bootstrap graph per bucket, but a 2k-face mesh is not
    # swept as 131k triangles during the build-overlap window
    BOOT_TRI_BUCKET = 2048

    @classmethod
    def from_mesh_bootstrap(cls, points, normals, tri_verts, batch_size,
                            percentiles, stddev=0.01):
        """Mesh-mode sampler that is ready IMMEDIATELY: no candidate-grid
        build.  The per-step oracle is the exact brute closest-point
        sweep (:func:`.mesh_distance.point_triangle_distance` — the
        round-1 training oracle), used as the bootstrap while
        :mod:`.async_build` builds the coordinate table on a host thread;
        the trainer hot-swaps the table in at a chunk boundary (the
        sampler is a jit *argument*, so the swap is just a different
        pytree structure).  Exact, so results do not depend on when the
        swap lands (up to the table oracle's near-exactness guarantee and
        f32 association)."""
        sizes = BatchSizes.from_config(batch_size, percentiles)
        tv = np.asarray(tri_verts, np.float32)
        if len(tv):
            t_pad = next_bucket(len(tv), cls.BOOT_TRI_BUCKET)
            if t_pad > len(tv):
                far = np.full((t_pad - len(tv), 3, 3), 11.0, np.float32)
                tv = np.concatenate([tv, far])
        return cls(
            surface_points=jnp.asarray(points, jnp.float32),
            surface_normals=jnp.asarray(normals, jnp.float32),
            static=SamplerStatic(sizes, "mesh", stddev),
            tri_verts=jnp.asarray(tv),
        )

    @classmethod
    def from_point_cloud_bootstrap(cls, points, normals, batch_size,
                                   percentiles, stddev=0.01):
        """pc-mode sampler that is ready immediately: the per-step far
        oracle is the exact brute nearest-point sweep
        (:func:`.mesh_distance.point_cloud_distance`) until the
        candidate table swap lands (see :mod:`.async_build`)."""
        sizes = BatchSizes.from_config(batch_size, percentiles)
        return cls(
            surface_points=jnp.asarray(points, jnp.float32),
            surface_normals=jnp.asarray(normals, jnp.float32),
            static=SamplerStatic(sizes, "pointcloud", stddev),
        )

    @classmethod
    def from_mesh(cls, points, normals, tri_verts, batch_size, percentiles,
                  stddev=0.01, pad_triangles: bool = True,
                  oracle_layout: str = "table", cache_path: str | None = None):
        """``oracle_layout="table"`` (default) materialises the candidate
        grid as per-cell triangle *coordinates* (``build_triangle_table``):
        the per-step oracle becomes one contiguous row gather — 7.4× faster
        than the scattered per-triangle gather of the ``"indices"`` layout
        (measured 20.8 → 2.8 ms at Q=20480, k=96) — and the table shape is
        the same for every mesh, so compiled train steps are shared across
        shapes with no triangle padding at all.

        ``oracle_layout="indices"`` keeps the index grid + triangle array
        (396 MB → ~47 MB of HBM, for memory-constrained many-shape
        scenarios); there ``pad_triangles`` pads the triangle count to a
        fixed bucket (power of two above ``TRI_PAD_BUCKET`` for giant
        meshes) with degenerate far-away triangles, so meshes with
        different face counts still share one compiled train step.

        ``cache_path`` (optional) caches the one-shot candidate-grid build
        on disk, keyed by the triangle bytes (:mod:`.oracle_cache`) — the
        build is the dominant non-train phase (~17-50 s host cKDTree) and
        is identical across retrains of the same asset."""
        from .oracle_cache import cached_candidate_grid

        sizes = BatchSizes.from_config(batch_size, percentiles)
        # candidates come from the REAL triangles only (indices are stable
        # under padding; padded far-away degenerates can never be nearest,
        # and coincident padding points degrade the KD-tree badly)
        real = np.asarray(tri_verts, np.float32)
        cand = cached_candidate_grid(real, cache_path)
        if oracle_layout == "table":
            return cls(
                surface_points=jnp.asarray(points, jnp.float32),
                surface_normals=jnp.asarray(normals, jnp.float32),
                static=SamplerStatic(sizes, "mesh", stddev),
                tri_table=build_triangle_table(jnp.asarray(real), cand),
            )
        if oracle_layout != "indices":
            raise ValueError(f"unknown oracle_layout: {oracle_layout!r}")
        tv = real
        if pad_triangles and len(tv):
            t_pad = next_bucket(len(tv), cls.TRI_PAD_BUCKET)
            if t_pad > len(tv):
                far = np.full((t_pad - len(tv), 3, 3), 11.0, np.float32)
                tv = np.concatenate([tv, far])
        return cls(
            surface_points=jnp.asarray(points, jnp.float32),
            surface_normals=jnp.asarray(normals, jnp.float32),
            static=SamplerStatic(sizes, "mesh", stddev),
            tri_verts=jnp.asarray(tv),
            tri_candidates=cand,
        )

    def local(self, n_devices: int) -> "TrainingSampler":
        """Per-device sampler for the shard_map DP step: each device draws
        its own ``batch/n_devices`` sub-batch (same [surf|far|near] layout),
        so the single-chip loss code (including the leading-rows Hessian
        split and the Pallas fused ops) runs unchanged per shard with zero
        resharding."""
        sz = self.static.sizes
        for name, v in (("on_surface", sz.on_surface), ("far", sz.far),
                        ("near", sz.near)):
            if v % n_devices:
                raise ValueError(
                    f"batch group {name}={v} not divisible by mesh size "
                    f"{n_devices}; pick batch_size/sampling_percentiles that "
                    f"split evenly"
                )
        local_sizes = BatchSizes(
            on_surface=sz.on_surface // n_devices,
            far=sz.far // n_devices,
            near=sz.near // n_devices,
        )
        return dataclasses.replace(
            self,
            static=SamplerStatic(local_sizes, self.static.oracle,
                                 self.static.stddev),
        )

    def sample(self, key: jax.Array):
        """-> (points (B,3), normals (B,3), sdf (B,1)), B = sizes.total."""
        sz = self.static.sizes
        k_surf, k_far, k_near_idx, k_near_off = jax.random.split(key, 4)

        n_cloud = self.surface_points.shape[0]
        surf_idx = jax.random.randint(k_surf, (sz.on_surface,), 0, n_cloud)
        surf_pts = self.surface_points[surf_idx]
        surf_nrm = self.surface_normals[surf_idx]

        far_pts = jax.random.uniform(
            k_far, (sz.far, 3), jnp.float32, minval=-1.0, maxval=1.0
        )

        near_sel = jax.random.randint(k_near_idx, (sz.near,), 0, sz.on_surface)
        base_pts = surf_pts[near_sel]
        base_nrm = surf_nrm[near_sel]
        offset = self.static.stddev * jax.random.normal(k_near_off, (sz.near, 1), jnp.float32)
        near_pts = base_pts + base_nrm * offset

        if self.static.oracle == "mesh":
            # UNSIGNED distance (documented deviation): the reference feeds
            # Open3D *signed* distances here (``dataset.py:35,50``), but no
            # shipping loss ever reads the sign — every tanh-mode term is
            # even in the GT distance (``train/losses.py:98-118``: d·tanh(αd)
            # and |tanh + αd·sech²| are even) and the siren loss only tests
            # d == 0 (``train/losses.py:159-166``).  Dropping the sign lets
            # the oracle skip the O(Q·T) generalized-winding sweep and use
            # the candidate-grid closest-point kernel (exact per candidate
            # set, ~point-cloud-oracle speed).
            q = jnp.concatenate([far_pts, near_pts], axis=0)
            if self.tri_table is not None:
                both = point_triangle_distance_table(q, self.tri_table)
            elif self.tri_candidates is not None:
                both = point_triangle_distance_cells(
                    q, self.tri_verts, self.tri_candidates
                )
            else:
                # bootstrap (no grid yet): exact brute closest-point sweep,
                # run FLAT (tile ≥ Q → zero control flow).  Alternatives
                # measured inside the scan-in-scan train step on the remote
                # compiler: pruned lax.top_k — 292 s compile + ~0.15 s/step;
                # lax.map-tiled brute — 94-385 s compile, never served from
                # the persistent cache.  The flat sweep is one fused
                # elementwise+min-reduce (~3.7 GFLOP/step at the 4096-
                # triangle bucket; XLA streams the (Q, T) pair tiles
                # through VMEM without materialising them)
                both = point_triangle_distance(
                    q, self.tri_verts, tile=q.shape[0]
                )
            far_sdf = both[: sz.far]
            near_sdf = both[sz.far :]
        elif self.pc_candidates is not None:
            # candidate-grid nearest-point oracle: exact f32 values with no
            # Q×N matmul (the MXU path either pays bf16 ranking noise or 3
            # f32 passes — see mesh_distance._min_sq_dist_tile)
            far_sdf = point_cloud_distance_cells(far_pts, self.pc_candidates)
            near_sdf = jnp.abs(offset)[:, 0]
        else:
            far_sdf = point_cloud_distance(far_pts, self.surface_points)
            near_sdf = jnp.abs(offset)[:, 0]

        points = jnp.concatenate([surf_pts, far_pts, near_pts], axis=0)
        normals = jnp.concatenate(
            [surf_nrm, jnp.zeros((sz.far + sz.near, 3), jnp.float32)], axis=0
        )
        sdf = jnp.concatenate(
            [jnp.zeros((sz.on_surface,), jnp.float32), far_sdf, near_sdf], axis=0
        )[:, None]
        return points, normals, sdf


jax.tree_util.register_dataclass(
    TrainingSampler,
    data_fields=["surface_points", "surface_normals", "tri_verts",
                 "tri_candidates", "tri_table", "pc_candidates"],
    meta_fields=["static"],
)
