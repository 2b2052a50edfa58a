#!/usr/bin/env python
"""A/B: approximate-kNN (cKDTree eps>0) inside build_candidate_grid.

Hypothesis: the build is dominated by the kq=2k tree query; scipy's
``eps`` prunes subtrees whose bounding box cannot beat (1+eps)·d_kth,
cutting query time.  Exactness of the CANDIDATE SETS is preserved by a
conservative escalation test: any unqueried point's true distance is
≥ d_returned_max/(1+eps), so requiring
``d[:, -1]/(1+eps) ≥ tau + rad_small_max`` keeps the exact-exclusion
guarantee (at the cost of more escalations as eps grows).

Interleaved A/B (box-load variance is ±30%, CLAUDE.md): alternate
eps=0 / eps in a single process on the same data, several reps, report
medians, and assert the candidate-derived distances match brute force.

Host-only (numpy/scipy); no TPU needed.
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

from diffudf_tpu.data import mesh_distance as md  # noqa: E402


def build_with_eps(tri_verts, eps: float, g=None, k=None):
    """build_candidate_grid with eps-approximate queries + the conservative
    escalation correction.  Mirrors mesh_distance.build_candidate_grid
    (kept in sync by the equivalence assertion in main())."""
    from scipy.spatial import cKDTree

    g = g or md.CAND_GRID_G
    k = k or md.CAND_GRID_K
    lo, hi = md.CAND_GRID_LO, md.CAND_GRID_HI

    tv = np.asarray(tri_verts, np.float32)
    cen = tv.mean(axis=1)
    rad = np.sqrt(np.max(np.sum((tv - cen[:, None, :]) ** 2, axis=-1), axis=1))
    t = len(cen)
    k = min(k, t)

    centers = md._cell_centers(g, lo, hi)
    n_cells = len(centers)

    nb = min(t, md.CAND_BIG_MAX)
    big = np.argpartition(rad, t - nb)[t - nb:] if nb < t else np.arange(t)
    small_mask = np.ones(t, bool)
    small_mask[big] = False
    small = np.flatnonzero(small_mask)
    ts = len(small)
    rad_small_max = np.float32(rad[small].max()) if ts else np.float32(0.0)
    cen_big, rad_big = cen[big], rad[big]
    cen_big_sq = np.sum(cen_big * cen_big, axis=1)

    tree = cKDTree(cen[small]) if ts else None
    kq0 = min(max(2 * k, k + 32), ts) if ts else 0
    shrink = 1.0 / (1.0 + eps)

    cand = np.empty((n_cells, k), np.int64)
    chunk = 16384
    n_escal = 0
    for s in range(0, n_cells, chunk):
        pts = centers[s:s + chunk]
        m = len(pts)
        d2 = (
            np.sum(pts * pts, axis=1)[:, None]
            - 2.0 * (pts @ cen_big.T)
            + cen_big_sq[None, :]
        )
        lb_big = np.sqrt(np.maximum(d2, 0.0)).astype(np.float32) - rad_big

        rows = np.arange(m)
        kq = kq0
        while True:
            if ts and kq >= 4096 and kq < ts:
                d2s = (
                    np.sum(pts[rows] * pts[rows], axis=1)[:, None]
                    - 2.0 * (pts[rows] @ cen[small].T)
                    + np.sum(cen[small] * cen[small], axis=1)[None, :]
                )
                lb_s = np.sqrt(np.maximum(d2s, 0.0)).astype(np.float32) - rad[small]
                lb_all = np.concatenate([lb_s, lb_big[rows]], axis=1)
                ids_all = np.concatenate(
                    [np.broadcast_to(small, lb_s.shape),
                     np.broadcast_to(big, (len(rows), nb))], axis=1)
                part = np.argpartition(lb_all, k - 1, axis=1)[:, :k]
                cand[s + rows] = np.take_along_axis(ids_all, part, axis=1)
                break
            if ts and kq:
                d, idx = tree.query(pts[rows], k=kq, eps=eps, workers=-1)
                if kq == 1:
                    d, idx = d[:, None], idx[:, None]
                lb_s = (d - rad[small[idx]]).astype(np.float32)
                lb_all = np.concatenate([lb_s, lb_big[rows]], axis=1)
                ids_all = np.concatenate(
                    [small[idx], np.broadcast_to(big, (len(rows), nb))], axis=1)
            else:
                lb_all = lb_big[rows]
                ids_all = np.broadcast_to(big, (len(rows), nb))
            if lb_all.shape[1] > k:
                part = np.argpartition(lb_all, k - 1, axis=1)[:, :k]
                sel = np.take_along_axis(ids_all, part, axis=1)
                tau = np.take_along_axis(lb_all, part, axis=1).max(axis=1)
            else:
                sel = np.array(ids_all)
                tau = lb_all.max(axis=1)
            cand[s + rows] = sel
            if not ts or kq >= ts:
                break
            # conservative under eps: true d_kq >= returned/(1+eps)
            unsafe = d[:, -1] * shrink < tau + rad_small_max
            if not unsafe.any():
                break
            rows = rows[unsafe]
            n_escal += int(unsafe.sum())
            kq = min(max(kq * 2, 256), ts)

    return cand.astype(np.int32), n_escal


def make_soup(rng, n):
    """Surface-like soup: points on a wavy torus shell, tri size ~ mesh."""
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(0, 2 * np.pi, n)
    r = 0.25 + 0.05 * np.sin(3 * u)
    base = np.stack([
        (0.6 + r * np.cos(v)) * np.cos(u),
        (0.6 + r * np.cos(v)) * np.sin(u),
        r * np.sin(v),
    ], -1).astype(np.float32)
    e1 = rng.normal(size=(n, 3)).astype(np.float32) * 0.01
    e2 = rng.normal(size=(n, 3)).astype(np.float32) * 0.01
    return np.stack([base, base + e1, base + e2], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=100000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--eps", type=float, nargs="+", default=[0.1, 0.25, 0.5])
    ap.add_argument("--mesh", default=None,
                    help="optional _t.obj to use real geometry")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.mesh:
        from diffudf_tpu.data.mesh_io import load_mesh

        m = load_mesh(args.mesh)
        tris = np.asarray(m.vertices[m.faces], np.float32)
        print(f"mesh: {args.mesh} T={len(tris)}")
    else:
        tris = make_soup(rng, args.tris)
        print(f"synthetic soup T={len(tris)}")

    variants = [0.0] + list(args.eps)
    times = {e: [] for e in variants}
    cands = {}
    for rep in range(args.reps):
        for e in variants:  # interleaved
            t0 = time.perf_counter()
            cand, n_esc = build_with_eps(tris, e)
            dt = time.perf_counter() - t0
            times[e].append(dt)
            cands[e] = cand
            print(f"rep {rep} eps={e}: {dt:.2f}s escalated_rows={n_esc}")

    # candidate-set equivalence: same induced oracle DISTANCES on
    # training-like queries (sets may permute / break ties differently)
    import jax.numpy as jnp

    from diffudf_tpu.data.mesh_distance import point_triangle_distance_cells

    q = jnp.asarray(
        rng.uniform(-1.0, 1.0, size=(8192, 3)).astype(np.float32)
    )
    tv = jnp.asarray(tris)
    ref = np.asarray(point_triangle_distance_cells(q, tv, jnp.asarray(cands[0.0])))
    for e in variants[1:]:
        got = np.asarray(point_triangle_distance_cells(q, tv, jnp.asarray(cands[e])))
        err = np.abs(got - ref).max()
        print(f"eps={e}: max |d - d_exact| on cell centers = {err:.2e}")

    print("\nmedians:")
    for e in variants:
        print(f"  eps={e}: {np.median(times[e]):.2f}s")


if __name__ == "__main__":
    main()
