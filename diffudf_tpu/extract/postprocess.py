"""Mesh post-processing: cleanup loop + border Laplacian smoothing.

Dependency-free numpy/scipy re-implementation of the trimesh pipeline the
reference runs after MeshUDF extraction (``src/render_mc.py:148-197``):

  * iterate {merge duplicate vertices, drop duplicate & degenerate faces,
    drop unreferenced vertices, fill single-triangle holes} until stable
    (≤10 rounds);
  * optionally smooth open-boundary ("border") vertices with 5 rounds of
    λ=0.3 Laplacian over the border-edge adjacency only.
"""

from __future__ import annotations

import numpy as np


def _merge_duplicate_vertices(verts, faces, decimals: int = 8):
    keys = np.round(verts * (10**decimals)).astype(np.int64)
    uniq, first_idx, inverse = np.unique(
        keys, axis=0, return_index=True, return_inverse=True
    )
    return verts[first_idx], inverse[faces]


def _drop_bad_faces(faces):
    # degenerate: repeated vertex indices
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[good]
    # duplicates irrespective of winding: canonical sorted key
    key = np.sort(faces, axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    return faces[np.sort(first)]


def _drop_unreferenced(verts, faces):
    used = np.unique(faces)
    remap = np.full(len(verts), -1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[faces]


def boundary_edges(faces):
    """Edges belonging to exactly one face: (E, 2) sorted vertex pairs."""
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    uniq, counts = np.unique(e, axis=0, return_counts=True)
    return uniq[counts == 1]


def _fill_triangle_holes(verts, faces):
    """Close boundary loops of exactly 3 vertices (trimesh ``fill_holes``
    for the single-triangle case)."""
    be = boundary_edges(faces)
    if len(be) == 0:
        return faces
    # adjacency among boundary vertices
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in be:
        adj[u].add(v)
        adj[v].add(u)
    new_faces = []
    seen = set()
    for u in list(adj):
        for v in adj[u]:
            if v <= u:
                continue
            common = adj[u] & adj[v]
            for w in common:
                if w <= v:
                    continue
                tri = (u, v, w)
                if tri not in seen:
                    seen.add(tri)
                    new_faces.append(tri)
    if not new_faces:
        return faces
    return np.concatenate([faces, np.asarray(new_faces, dtype=faces.dtype)])


def clean_mesh(verts, faces, max_iters: int = 10, fill_holes: bool = True):
    """Iterated cleanup until (V, F) counts stabilise (≤ ``max_iters``)."""
    verts = np.asarray(verts, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    prev = (-1, -1)
    for _ in range(max_iters):
        if len(faces) == 0:
            break
        verts, faces = _merge_duplicate_vertices(verts, faces)
        faces = _drop_bad_faces(faces)
        verts, faces = _drop_unreferenced(verts, faces)
        if fill_holes:
            faces = _fill_triangle_holes(verts, faces)
        cur = (len(verts), len(faces))
        if cur == prev:
            break
        prev = cur
    return verts, faces


def smooth_borders(verts, faces, lam: float = 0.3, iters: int = 5):
    """Laplacian-smooth open-boundary vertices along the border adjacency
    (``src/render_mc.py:169-197`` semantics: neighbours come from border
    edges only)."""
    verts = np.array(verts, dtype=np.float64, copy=True)
    be = boundary_edges(np.asarray(faces, dtype=np.int64))
    if len(be) == 0:
        return verts
    from scipy.sparse import coo_matrix

    border_vertices = np.unique(be)
    index_of = {v: i for i, v in enumerate(border_vertices)}
    rows, cols = [], []
    for u, v in be:
        rows.append(index_of[u]); cols.append(v)
        rows.append(index_of[v]); cols.append(u)
    mat = coo_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(len(border_vertices), len(verts))
    ).tocsr()
    deg = np.asarray(mat.sum(axis=1)).ravel()[:, None]
    for _ in range(iters):
        avg = mat @ verts / deg
        verts[border_vertices] += lam * (avg - verts[border_vertices])
    return verts
