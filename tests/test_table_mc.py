"""Tests for the table-driven MC backend (extract/table_mc.py).

The backend is the rebuild's counterpart of the reference's Lewiner MC33
triangulation; tables are generated from first principles, so these tests
pin down the invariants the generation must satisfy: watertightness,
crack-freeness under face ambiguity, winding, and metric accuracy.
"""

import numpy as np
import pytest

from diffudf_tpu.extract.mc_tables import (
    AMB_MASK, CASE_OFFSET, EDGE_CORNERS, TRI_TABLE,
)
from diffudf_tpu.extract.table_mc import marching_cubes_cells
from diffudf_tpu.extract.tet_mc import marching_tets_cells
from diffudf_tpu.extract.triangulate import triangulate_cells


def _active_cells(field):
    n = field.shape[0]
    uc = [
        field[c & 1 : n - 1 + (c & 1),
              (c >> 1) & 1 : n - 1 + ((c >> 1) & 1),
              (c >> 2) & 1 : n - 1 + ((c >> 2) & 1)]
        for c in range(8)
    ]
    cmin = np.minimum.reduce(uc)
    cmax = np.maximum.reduce(uc)
    idx = np.argwhere((cmin < 0) & (cmax >= 0))
    vals = np.stack([u[tuple(idx.T)] for u in uc], 1)
    return idx, vals


def _grid(n):
    xs = np.linspace(-1, 1, n)
    return np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)


def _edge_counts(faces):
    e = np.sort(np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]), 1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return counts


def test_tables_basic_invariants():
    # single-corner case: one triangle on the 3 edges incident to corner 0
    tris = TRI_TABLE[CASE_OFFSET[1]]
    tris = tris[tris[:, 0] >= 0]
    assert len(tris) == 1
    for e in tris[0]:
        assert 0 in EDGE_CORNERS[e]
    # complement symmetry of triangle counts for unambiguous cases
    for mask in range(256):
        if AMB_MASK[mask] or AMB_MASK[255 - mask]:
            continue
        t1 = (TRI_TABLE[CASE_OFFSET[mask]][:, 0] >= 0).sum()
        t2 = (TRI_TABLE[CASE_OFFSET[255 - mask]][:, 0] >= 0).sum()
        assert t1 == t2
    # empty cases
    assert (TRI_TABLE[CASE_OFFSET[0]][:, 0] >= 0).sum() == 0
    assert (TRI_TABLE[CASE_OFFSET[255]][:, 0] >= 0).sum() == 0


def test_sphere_watertight_outward_accurate():
    n = 48
    sdf = np.linalg.norm(_grid(n), axis=-1) - 0.7
    idx, vals = _active_cells(sdf)
    verts, faces = marching_cubes_cells(idx, vals, 2.0 / (n - 1))
    verts -= 1.0
    assert len(faces) > 1000
    # watertight: every edge shared by exactly two faces
    assert (_edge_counts(faces) == 2).all()
    # accuracy: vertices on the r=0.7 sphere within a fraction of a voxel
    rad = np.linalg.norm(verts, axis=1)
    assert np.abs(rad - 0.7).max() < 0.05 * (2.0 / (n - 1))
    # winding: normals point outward (toward positive field)
    tri = verts[faces]
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    c = tri.mean(1)
    assert (np.sum(nrm * c, axis=1) > 0).all()


def test_ambiguous_field_crack_free():
    # trig mixture produces hundreds of ambiguous faces
    n = 48
    g = _grid(n)
    f = np.sin(3 * g[..., 0]) * np.cos(4 * g[..., 1]) \
        + np.sin(5 * g[..., 2]) * np.cos(2 * g[..., 0]) + 0.3
    idx, vals = _active_cells(f)
    verts, faces = marching_cubes_cells(idx, vals, 1.0)
    counts = _edge_counts(faces)
    assert (counts <= 2).all()  # manifold
    # open edges allowed only where the surface exits the lattice
    e = np.sort(np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]), 1)
    ue, counts = np.unique(e, axis=0, return_counts=True)
    open_pts = verts[ue[counts == 1]].reshape(-1, 3)
    on_boundary = (open_pts <= 1e-9).any(1) | (open_pts >= n - 1 - 1e-9).any(1)
    assert on_boundary.reshape(-1, 2).all(1).all()


def test_fewer_triangles_and_better_normals_than_tets():
    n = 48
    sdf = np.linalg.norm(_grid(n), axis=-1) - 0.7
    idx, vals = _active_cells(sdf)
    v1, f1 = marching_cubes_cells(idx, vals, 2.0 / (n - 1))
    v2, f2 = marching_tets_cells(idx.astype(float), vals, 2.0 / (n - 1))

    def nc(v, f):
        v = v - 1.0
        tri = v[f]
        nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
        c = tri.mean(1)
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
        return np.mean(1 - np.abs((nrm * c).sum(1)))

    assert len(f1) < 0.5 * len(f2)
    assert nc(v1, f1) < nc(v2, f2)


def test_dispatch():
    n = 24
    sdf = np.linalg.norm(_grid(n), axis=-1) - 0.6
    idx, vals = _active_cells(sdf)
    for method in ("mc33", "tets"):
        verts, faces = triangulate_cells(idx, vals, 1.0, method)
        assert len(faces) > 0
    with pytest.raises(ValueError, match="Invalid triangulator"):
        triangulate_cells(idx, vals, 1.0, "bogus")


def test_empty_input():
    v, f = marching_cubes_cells(np.zeros((0, 3)), np.zeros((0, 8)), 1.0)
    assert len(v) == 0 and len(f) == 0
