"""Disk cache for the one-shot candidate-grid oracle builds.

The candidate grids (:func:`.mesh_distance.build_candidate_grid` /
:func:`.mesh_distance.build_point_candidate_grid`) are pure functions of
the preprocessed geometry plus the module grid constants, but the mesh
build costs ~17-50 s of host cKDTree time per shape (the dominant
non-train phase, see ``results/BEETLE_phase_profile.json``) and is re-paid
on every retrain of the same asset — a different config, a resumed sweep,
an ablation.  The reference has the same shape: its Open3D RaycastingScene
is rebuilt per run (``src/dataset.py:30-36``), it just hides the cost in
the per-step query path.

Here the grids are cached next to the preprocessed asset, keyed by a
SHA-1 of the exact input bytes plus the grid geometry, so a stale
mesh/cloud or changed constants rebuilds silently.  Each oracle field
lives in its OWN file (``<dataset>_oracle_cache.npz.tri_cand.npz`` /
``….pc_cand.npz``) so concurrent writers — a mesh-mode and a pc-mode run
of the same asset, or the background build thread of
:mod:`.async_build` — can never clobber each other's entry (a merged
read-modify-write file could silently drop the other oracle's field).
Legacy merged files are still READ for migration.  Only candidate
*indices* are stored (the mesh table's per-cell coordinate rows are
re-materialised by a millisecond device gather in
``build_triangle_table``; the point table re-gathers host-side), keeping
the file ~40 MB instead of ~400.

Writes are atomic (tmp + ``os.replace``) and best-effort: an unwritable
directory degrades to a warning, never an error.

The ``*_host`` variants return plain numpy and touch no device — they are
what the background build thread runs (device placement happens on the
main thread at swap time, see :mod:`.async_build`).
"""

from __future__ import annotations

import hashlib
import os
import warnings

import numpy as np

from . import mesh_distance as md

_FORMAT_VERSION = 1


def _key(kind: str, data: np.ndarray, g: int, k: int, lo: float, hi: float) -> str:
    h = hashlib.sha1()
    h.update(
        f"{_FORMAT_VERSION}|{kind}|{data.shape}|{g}|{k}|{lo}|{hi}|".encode()
    )
    h.update(np.ascontiguousarray(data, np.float32).tobytes())
    return h.hexdigest()


def _field_path(path: str, field: str) -> str:
    return f"{path}.{field}.npz"


def _read_field(path: str, field: str, key: str) -> np.ndarray | None:
    if not path or not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            if field + "_key" not in z.files:
                return None
            if str(z[field + "_key"]) == key:
                return z[field]
    except Exception as e:  # corrupt/foreign file: rebuild
        warnings.warn(f"oracle cache {path} unreadable ({e}); rebuilding")
    return None


def _load(path: str, field: str, key: str) -> np.ndarray | None:
    if not path:
        return None
    hit = _read_field(_field_path(path, field), field, key)
    if hit is not None:
        return hit
    # legacy single-file layout (read-only migration path)
    return _read_field(path, field, key)


def _store(path: str, field: str, key: str, idx: np.ndarray) -> None:
    """Write one oracle field to its own npz (concurrent-writer safe)."""
    if not path:
        return
    dst = _field_path(path, field)
    # np.savez appends ".npz" when the name lacks it — keep the suffix so
    # the tmp name is exactly what os.replace moves
    tmp = f"{dst}.{os.getpid()}.tmp.npz"
    try:
        np.savez(tmp, **{field: idx, field + "_key": np.asarray(key)})
        os.replace(tmp, dst)
    except OSError as e:
        warnings.warn(f"could not write oracle cache {dst}: {e}")
        try:
            os.remove(tmp)
        except OSError:
            pass


def cached_candidate_grid_host(tri_verts, cache_path: str | None) -> np.ndarray:
    """``build_candidate_grid`` with an optional npz disk cache — host side.

    tri_verts: (T, 3, 3) host array.  Returns the (g³, k) int32 candidate
    grid as NUMPY (no device traffic; safe from a background thread),
    loading it from ``cache_path`` when the stored SHA-1 of the triangle
    bytes + grid constants matches.
    """
    tv = np.asarray(tri_verts, np.float32)
    g, k = md.CAND_GRID_G, md.CAND_GRID_K
    lo, hi = md.CAND_GRID_LO, md.CAND_GRID_HI
    key = _key("tri", tv, g, k, lo, hi)
    hit = _load(cache_path, "tri_cand", key)
    if hit is not None:
        return hit.astype(np.int32)
    cand = md.build_candidate_grid(tv, as_numpy=True)
    if cache_path:
        _store(cache_path, "tri_cand", key, cand)
    return cand


def cached_candidate_grid(tri_verts, cache_path: str | None):
    """Device-array wrapper of :func:`cached_candidate_grid_host`."""
    import jax.numpy as jnp

    return jnp.asarray(cached_candidate_grid_host(tri_verts, cache_path))


def cached_point_candidate_idx_host(cloud, cache_path: str | None) -> np.ndarray:
    """pc-oracle candidate *indices* with an optional disk cache — host side.

    cloud: (N, 3) host array.  Returns (g³, k) int32 numpy indices into
    the cloud (gather ``cloud[idx]`` for the coordinate table).
    """
    pts = np.asarray(cloud, np.float32)
    g, k = md.CAND_GRID_G, md.CAND_PTS_K
    lo, hi = md.CAND_GRID_LO, md.CAND_GRID_HI
    key = _key("pc", pts, g, k, lo, hi)
    hit = _load(cache_path, "pc_cand", key)
    if hit is not None:
        return hit.astype(np.int32)
    idx = md.build_point_candidate_indices(pts)
    if cache_path:
        _store(cache_path, "pc_cand", key, idx)
    return idx


def cached_point_candidate_grid(cloud, cache_path: str | None):
    """``build_point_candidate_grid`` with an optional npz disk cache.

    Returns the (g³, k, 3) f32 coordinate table as a device array.
    """
    import jax.numpy as jnp

    pts = np.asarray(cloud, np.float32)
    return jnp.asarray(pts[cached_point_candidate_idx_host(pts, cache_path)])
