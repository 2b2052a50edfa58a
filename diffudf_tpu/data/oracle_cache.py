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

Here the grids are cached next to the preprocessed asset
(``<dataset>_oracle_cache.npz``), keyed by a SHA-1 of the exact input
bytes plus the grid geometry, so a stale mesh/cloud or changed constants
rebuilds silently.  Only candidate *indices* are stored (the mesh table's
per-cell coordinate rows are re-materialised by a millisecond device
gather in ``build_triangle_table``; the point table re-gathers host-side),
keeping the file ~40 MB instead of ~400.

Writes are atomic (tmp + ``os.replace``) and best-effort: an unwritable
directory degrades to a warning, never an error.
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


def _load(path: str, field: str, key: str) -> np.ndarray | None:
    if not path or not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            if field + "_key" not in z.files:  # other oracle's file: miss
                return None
            if str(z[field + "_key"]) == key:
                return z[field]
    except Exception as e:  # corrupt/foreign file: rebuild
        warnings.warn(f"oracle cache {path} unreadable ({e}); rebuilding")
    return None


def _store(path: str, field: str, key: str, idx: np.ndarray) -> None:
    """Merge one field into the npz (both oracles share the file)."""
    if not path:
        return
    entries = {}
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                entries = {n: z[n] for n in z.files}
        except Exception:
            entries = {}
    entries[field] = idx
    entries[field + "_key"] = np.asarray(key)
    # np.savez appends ".npz" when the name lacks it — keep the suffix so
    # the tmp name is exactly what os.replace moves
    tmp = f"{path}.{os.getpid()}.tmp.npz"
    try:
        np.savez(tmp, **entries)
        os.replace(tmp, path)
    except OSError as e:
        warnings.warn(f"could not write oracle cache {path}: {e}")
        try:
            os.remove(tmp)
        except OSError:
            pass


def cached_candidate_grid(tri_verts, cache_path: str | None):
    """``build_candidate_grid`` with an optional npz disk cache.

    tri_verts: (T, 3, 3) host array.  Returns the (g³, k) int32 candidate
    grid as a device array, loading it from ``cache_path`` when the stored
    SHA-1 of the triangle bytes + grid constants matches.
    """
    import jax.numpy as jnp

    tv = np.asarray(tri_verts, np.float32)
    g, k = md.CAND_GRID_G, md.CAND_GRID_K
    lo, hi = md.CAND_GRID_LO, md.CAND_GRID_HI
    key = _key("tri", tv, g, k, lo, hi)
    hit = _load(cache_path, "tri_cand", key) if cache_path else None
    if hit is not None:
        return jnp.asarray(hit.astype(np.int32))
    cand = md.build_candidate_grid(tv)
    if cache_path:
        _store(cache_path, "tri_cand", key, np.asarray(cand, np.int32))
    return cand


def cached_point_candidate_grid(cloud, cache_path: str | None):
    """``build_point_candidate_grid`` with an optional npz disk cache.

    cloud: (N, 3) host array.  Returns the (g³, k, 3) f32 coordinate table
    as a device array; the cache stores candidate *indices* and re-gathers
    coordinates host-side (a numpy fancy index, milliseconds).
    """
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    pts = np.asarray(cloud, np.float32)
    g, k = md.CAND_GRID_G, md.CAND_PTS_K
    lo, hi = md.CAND_GRID_LO, md.CAND_GRID_HI
    key = _key("pc", pts, g, k, lo, hi)
    hit = _load(cache_path, "pc_cand", key) if cache_path else None
    if hit is not None:
        return jnp.asarray(pts[hit])
    if not cache_path:
        return md.build_point_candidate_grid(pts)
    # inline the builder's index path so the cache can store indices
    n = len(pts)
    k_eff = min(k, n)
    centers = md._cell_centers(g, lo, hi)
    _, idx = cKDTree(pts).query(centers, k=k_eff, workers=-1)
    if k_eff == 1:
        idx = idx[:, None]
    if idx.shape[1] < k:
        reps = -(-k // idx.shape[1])
        idx = np.tile(idx, (1, reps))[:, :k]
    idx = idx.astype(np.int32)
    _store(cache_path, "pc_cand", key, idx)
    return jnp.asarray(pts[idx])
