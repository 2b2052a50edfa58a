"""On-device ground-truth distance oracles.

The reference queries Open3D's host-side BVH RaycastingScene every training
step (``src/dataset.py:35,50``) — a CPU↔GPU round trip in the hot loop.  Here
both oracles are jit-compiled JAX kernels that run on the TPU inside the
training step:

  * :func:`point_cloud_distance` — exact nearest-neighbour distance to a
    surface sample cloud (the reference's ``shortestDistance`` brute force,
    ``src/dataset.py:72-78``) expressed as an MXU matmul with a tiled min
    reduction so the Q×N distance matrix is never materialised in HBM.
  * :func:`point_triangle_distance` — exact unsigned distance to a triangle
    mesh (closest-point-on-triangle, branchless Ericson construction),
    replacing the BVH with a brute-force-over-triangles sweep that
    vectorises perfectly; queries stream through ``lax.map`` tiles.
  * :func:`winding_number` — generalised winding number (solid-angle sum,
    Jacobson et al.) giving the inside/outside sign for signed distance.

All kernels take padded, statically-shaped arrays and are shard_map-friendly
(queries shard along the batch axis; the reference geometry is replicated).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _min_sq_dist_tile(q, x_sq, x):
    """q: (Tq, 3), x: (N, 3), x_sq: (N,) -> (Tq,) min squared distance.

    Rank in f32, return the exact elementwise value.  |q − x|² =
    |q|² − 2 q·x + |x|² puts the pair sweep on the MXU — but the TPU
    *default* matmul precision downcasts inputs to bf16, injecting
    ~4e-3·|q||x| noise into the d² landscape: larger than the NN margins
    of a dense unit-scale cloud (measured: up to 0.17 distance error when
    the bf16 ranking picks the argmin).  ``precision="float32"`` (3 MXU
    passes) makes the ranking exact to f32 rounding; the returned value is
    then recomputed elementwise so it carries no cancellation error from
    the |q|²−2q·x+|x|² form either.  Callers on the training hot path
    should prefer the candidate-grid oracle
    (:func:`point_cloud_distance_cells`) which is both faster and exact;
    this brute force is the offline/golden reference.
    """
    cross = jnp.dot(q, x.T, precision="float32")  # (Tq, N)
    idx = jnp.argmin(x_sq[None, :] - 2.0 * cross, axis=1)
    diff = q - jnp.take(x, idx, axis=0)  # x may be a host numpy array
    return jnp.sum(diff * diff, axis=1)


def point_cloud_distance(queries: jax.Array, cloud: jax.Array, tile: int = 2048):
    """Exact min Euclidean distance from each query to the cloud.

    queries: (Q, 3), cloud: (N, 3) -> (Q,).  Q must be a multiple of `tile`
    or smaller than it; use :func:`pad_to` upstream if needed.

    A fused Pallas variant exists as
    :func:`diffudf_tpu.ops.pallas_distance.min_distance_pallas` for
    host-level callers; it is NOT auto-dispatched here because this
    function also runs inside the compiled training scan, where nesting a
    pallas_call makes the remote TPU compiler pathologically slow.
    """
    q = queries.shape[0]
    if q <= tile:
        d2 = _min_sq_dist_tile(queries, jnp.sum(cloud * cloud, axis=1), cloud)
        return jnp.sqrt(jnp.maximum(d2, 0.0))
    if q % tile:
        pad = tile - q % tile
        padded = jnp.concatenate([queries, jnp.zeros((pad, 3), queries.dtype)])
        return point_cloud_distance(padded, cloud, tile)[:q]
    x_sq = jnp.sum(cloud * cloud, axis=1)
    tiles = queries.reshape(q // tile, tile, 3)
    d2 = lax.map(lambda t: _min_sq_dist_tile(t, x_sq, cloud), tiles)
    return jnp.sqrt(jnp.maximum(d2.reshape(q), 0.0))


def _closest_point_sq_dist(p, a, b, c):
    """Squared distance from points p (Tq, 1, 3) to triangles (1, T, 3).

    Branchless closest-point-on-triangle (the textbook Voronoi-region
    construction folded into nested `where`s — identical result to Ericson,
    RTCD §5.1.5, but fully vectorised).
    Shapes broadcast: returns (Tq, T).
    """
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    d3 = jnp.sum(ab * (p - b), axis=-1)
    d4 = jnp.sum(ac * (p - b), axis=-1)
    d5 = jnp.sum(ab * (p - c), axis=-1)
    d6 = jnp.sum(ac * (p - c), axis=-1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom = jnp.maximum(va + vb + vc, 1e-30)
    v = vb / denom
    w = vc / denom

    # interior barycentric candidate
    pt = a + v[..., None] * ab + w[..., None] * ac

    # edge/vertex regions
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0.0, 1.0)
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30), 0.0, 1.0)

    p_ab = a + t_ab[..., None] * ab
    p_ac = a + t_ac[..., None] * ac
    p_bc = b + t_bc[..., None] * (c - b)

    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (~in_vert_a) & (~in_vert_b) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = (~in_vert_a) & (~in_vert_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (~in_vert_b) & (~in_vert_c) & (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    closest = pt
    closest = jnp.where(in_edge_ab[..., None], p_ab, closest)
    closest = jnp.where(in_edge_ac[..., None], p_ac, closest)
    closest = jnp.where(in_edge_bc[..., None], p_bc, closest)
    closest = jnp.where(in_vert_a[..., None], jnp.broadcast_to(a, closest.shape), closest)
    closest = jnp.where(in_vert_b[..., None], jnp.broadcast_to(b, closest.shape), closest)
    closest = jnp.where(in_vert_c[..., None], jnp.broadcast_to(c, closest.shape), closest)

    diff = p - closest
    return jnp.sum(diff * diff, axis=-1)


def point_triangle_distance(queries: jax.Array, tri_verts: jax.Array, tile: int = 256):
    """Exact unsigned distance to a triangle soup.

    queries: (Q, 3); tri_verts: (T, 3, 3) -> (Q,)
    """
    a = tri_verts[:, 0][None]
    b = tri_verts[:, 1][None]
    c = tri_verts[:, 2][None]

    def one_tile(q):
        d2 = _closest_point_sq_dist(q[:, None, :], a, b, c)
        return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))

    qn = queries.shape[0]
    if qn <= tile:
        return one_tile(queries)
    if qn % tile:
        pad = tile - qn % tile
        padded = jnp.concatenate([queries, jnp.zeros((pad, 3), queries.dtype)])
        return point_triangle_distance(padded, tri_verts, tile)[:qn]
    tiles = queries.reshape(qn // tile, tile, 3)
    out = lax.map(one_tile, tiles)
    return out.reshape(qn)


def triangle_bounds(tri_verts: jax.Array):
    """(T, 3, 3) -> (centroids (T, 3), radii (T,)) bounding spheres."""
    c = tri_verts.mean(axis=1)
    r = jnp.sqrt(
        jnp.max(jnp.sum((tri_verts - c[:, None, :]) ** 2, axis=-1), axis=1)
    )
    return c, r


def point_triangle_distance_pruned(
    queries: jax.Array,
    tri_verts: jax.Array,
    centroids: jax.Array | None = None,
    radii: jax.Array | None = None,
    k: int = 64,
    tile: int = 1024,
):
    """Unsigned distance to a triangle soup via candidate pruning.

    The brute-force sweep (:func:`point_triangle_distance`) runs the ~60-op
    closest-point construction on every (query, triangle) pair — O(Q·T)
    heavy VPU work that dominated mesh-mode training (0.5G pair tests per
    step on a 24k-triangle mesh).  Here the pair work is split:

      1. a cheap MXU matmul gives each query its distance to every triangle
         *centroid*; ``max(d_centroid − r_tri, 0)`` lower-bounds the true
         triangle distance;
      2. ``lax.top_k`` keeps the ``k`` smallest lower bounds per query;
      3. the exact closest-point test runs only on those k candidates.

    Exact whenever the true nearest triangle is among the k best lower
    bounds — guaranteed by construction when k ≥ the number of triangles
    whose bounding sphere overlaps the nearest-candidate distance, which
    k=64 satisfies by orders of magnitude on preprocessed meshes
    (validated against the brute force in ``tests/test_data.py``).
    """
    T = tri_verts.shape[0]
    if T <= k:
        return point_triangle_distance(queries, tri_verts, tile=256)
    if centroids is None or radii is None:
        centroids, radii = triangle_bounds(tri_verts)
    c_sq = jnp.sum(centroids * centroids, axis=1)

    def one_tile(q):
        cross = jnp.dot(q, centroids.T, precision="float32")  # (Tq, T) MXU
        d2c = jnp.maximum(c_sq[None, :] - 2.0 * cross + jnp.sum(q * q, axis=1)[:, None], 0.0)
        lb = jnp.sqrt(d2c) - radii[None, :]
        _, idx = lax.top_k(-lb, k)  # (Tq, k) smallest lower bounds
        cand = tri_verts[idx]  # (Tq, k, 3, 3)
        d2 = _closest_point_sq_dist(
            q[:, None, :], cand[:, :, 0], cand[:, :, 1], cand[:, :, 2]
        )
        return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))

    qn = queries.shape[0]
    if qn <= tile:
        return one_tile(queries)
    if qn % tile:
        pad = tile - qn % tile
        padded = jnp.concatenate([queries, jnp.zeros((pad, 3), queries.dtype)])
        return point_triangle_distance_pruned(
            padded, tri_verts, centroids, radii, k, tile
        )[:qn]
    tiles = queries.reshape(qn // tile, tile, 3)
    return lax.map(one_tile, tiles).reshape(qn)


CAND_GRID_G = 48  # lattice resolution of the candidate grid
CAND_GRID_K = 96  # candidate triangles per cell
CAND_GRID_LO = -1.08  # covers [-1,1]³ plus the near-sample fringe
CAND_GRID_HI = 1.08


def _cell_centers(g: int, lo: float, hi: float):
    """(g³, 3) f32 numpy lattice of cell centers over [lo, hi]³."""
    import numpy as np

    cell = (hi - lo) / g
    ax = lo + (np.arange(g, dtype=np.float32) + 0.5) * cell
    cx, cy, cz = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)


# Triangles ranked in the top CAND_BIG_MAX by bounding radius are tested
# densely against every cell: the kNN-over-centroids shortcut is only safe
# when radii are bounded, and the few largest outliers (a ground plane, a
# coarse hull face) are exactly the ones a nearest-centroid query misses.
CAND_BIG_MAX = 512


def build_candidate_grid(
    tri_verts: jax.Array,
    centroids: jax.Array | None = None,
    radii: jax.Array | None = None,
    g: int = CAND_GRID_G,
    k: int = CAND_GRID_K,
    lo: float = CAND_GRID_LO,
    hi: float = CAND_GRID_HI,
    as_numpy: bool = False,
):
    """One-time candidate index: the k best-lower-bound triangles per cell
    of a g³ lattice over the query domain.

    Turns the per-step oracle into a flat gather + exact test with NO
    per-step top_k and no Q×T sweep: :func:`point_triangle_distance_cells`
    runs near point-cloud-oracle speed independent of the triangle count.

    The build runs on the HOST with a scipy cKDTree (a couple of seconds
    even at 131k triangles): the device version of this one-shot pass
    compiled pathologically on the remote TPU compiler (minutes) while its
    actual runtime is trivial.

    Candidate selection is the exact top-k by the bounding-sphere lower
    bound ``dist(cell_center, centroid) − radius`` over ALL triangles —
    the same criterion as :func:`point_triangle_distance_pruned`, not a
    nearest-centroid heuristic.  Exactness is kept cheap in two parts:
    the ``CAND_BIG_MAX`` largest-radius triangles are scored densely
    against every cell (a huge triangle's centroid can be arbitrarily far
    from cells its surface passes through), and the remaining bounded-
    radius triangles go through a centroid kNN whose width escalates per
    cell until the kq-th neighbour distance provably exceeds
    ``τ_k + max(small radii)`` — i.e. every unqueried triangle's lower
    bound is ≥ the selected k-th, so the exclusion is exact.

    Returns cand (g³, k) int32 — grid geometry is the module constants.
    ``as_numpy=True`` skips the device put (for the background build
    thread of :mod:`.async_build`, which must not touch the device).
    """
    import numpy as np
    from scipy.spatial import cKDTree

    if centroids is None or radii is None:
        # pure-numpy bounds: eager jax ops on the remote platform take
        # seconds per dispatch and their host reads can stall for minutes
        tv = np.asarray(tri_verts, np.float32)
        cen = tv.mean(axis=1)
        rad = np.sqrt(
            np.max(np.sum((tv - cen[:, None, :]) ** 2, axis=-1), axis=1)
        )
    else:
        cen = np.asarray(centroids, np.float32)
        rad = np.asarray(radii, np.float32)
    t = len(cen)
    k_out = k  # requested (compile-stable) width; tiny meshes tile up to it
    k = min(k, t)

    centers = _cell_centers(g, lo, hi)
    n_cells = len(centers)

    # split: largest-radius triangles scored densely, the rest via kNN
    nb = min(t, CAND_BIG_MAX)
    if nb < t:
        big = np.argpartition(rad, t - nb)[t - nb:]
    else:
        big = np.arange(t)
    small_mask = np.ones(t, bool)
    small_mask[big] = False
    small = np.flatnonzero(small_mask)
    ts = len(small)
    rad_small_max = np.float32(rad[small].max()) if ts else np.float32(0.0)
    cen_big, rad_big = cen[big], rad[big]
    cen_big_sq = np.sum(cen_big * cen_big, axis=1)

    tree = cKDTree(cen[small]) if ts else None
    kq0 = min(max(2 * k, k + 32), ts) if ts else 0

    cand = np.empty((n_cells, k), np.int64)
    chunk = 16384
    for s in range(0, n_cells, chunk):
        pts = centers[s:s + chunk]
        m = len(pts)
        # dense lower bounds vs the big set (m × nb matmul: trivial)
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
                # escalation blew past the kNN sweet spot: score the
                # remaining rows densely against all small triangles
                # (row count here is tiny — the pathological fringe)
                d2s = (
                    np.sum(pts[rows] * pts[rows], axis=1)[:, None]
                    - 2.0 * (pts[rows] @ cen[small].T)
                    + np.sum(cen[small] * cen[small], axis=1)[None, :]
                )
                lb_s = np.sqrt(np.maximum(d2s, 0.0)).astype(np.float32) - rad[small]
                lb_all = np.concatenate([lb_s, lb_big[rows]], axis=1)
                ids_all = np.concatenate(
                    [np.broadcast_to(small, lb_s.shape),
                     np.broadcast_to(big, (len(rows), nb))],
                    axis=1,
                )
                part = np.argpartition(lb_all, k - 1, axis=1)[:, :k]
                cand[s + rows] = np.take_along_axis(ids_all, part, axis=1)
                break
            if ts and kq:
                d, idx = tree.query(pts[rows], k=kq, workers=-1)
                if kq == 1:
                    d, idx = d[:, None], idx[:, None]
                lb_s = (d - rad[small[idx]]).astype(np.float32)
                lb_all = np.concatenate([lb_s, lb_big[rows]], axis=1)
                ids_all = np.concatenate(
                    [small[idx], np.broadcast_to(big, (len(rows), nb))],
                    axis=1,
                )
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
            # exclusion is exact when every unqueried small triangle's
            # lower bound (≥ d_kq − rad_small_max) is ≥ the selected k-th
            unsafe = d[:, -1] < tau + rad_small_max
            if not unsafe.any():
                break
            rows = rows[unsafe]
            kq = min(max(kq * 2, 256), ts)

    if cand.shape[1] < k_out:
        # tiny meshes: keep the (g³, k) shape compile-stable by repeating
        # candidates (duplicates are harmless under the min reduction)
        reps = -(-k_out // cand.shape[1])
        cand = np.tile(cand, (1, reps))[:, :k_out]
    cand = cand.astype(np.int32)
    return cand if as_numpy else jnp.asarray(cand)


def point_triangle_distance_cells(
    queries: jax.Array,
    tri_verts: jax.Array,
    cand: jax.Array,
    g: int = CAND_GRID_G,
    lo: float = CAND_GRID_LO,
    hi: float = CAND_GRID_HI,
):
    """Exact-on-candidates unsigned distance using a precomputed grid.

    queries: (Q, 3); cand: (g³, k) from :func:`build_candidate_grid`.
    Near-exact: the true nearest triangle is among a cell's k candidates
    whenever the k-th lower bound from the cell center exceeds the true
    distance by the cell half-diagonal — validated against the brute
    force on real preprocessed meshes in ``tests/test_data.py``.
    Runs flat (no lax.map): on-chip this is one gather plus a (Q, k)
    closest-point sweep — serial tiling was measured 20× slower.
    """
    cell = (hi - lo) / g
    q = queries.shape[0]
    k = cand.shape[1]
    ci = jnp.clip(
        jnp.floor((queries - lo) / cell).astype(jnp.int32), 0, g - 1
    )
    lin = (ci[:, 0] * g + ci[:, 1]) * g + ci[:, 2]
    ids = cand[lin]  # (Q, k)
    tv = jnp.take(tri_verts, ids.reshape(-1), axis=0).reshape(q, k, 3, 3)
    d2 = _closest_point_sq_dist(
        queries[:, None, :], tv[:, :, 0], tv[:, :, 1], tv[:, :, 2]
    )
    return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))


def build_triangle_table(tri_verts: jax.Array, cand: jax.Array) -> jax.Array:
    """Materialise the candidate grid as per-cell vertex *coordinates*.

    (T, 3, 3) triangles + (g³, k) candidate indices -> (g³, k·9) f32 rows,
    built by ONE device gather (the indices are already device-resident;
    shipping a host-built 382 MB table over the ~20 MB/s axon link would
    cost ~19 s, the device gather is milliseconds).

    Why coordinates, and why 2-D: the per-step scattered gather of
    (Q, k) triangle rows was measured at 19.3 ms of a 20.8 ms oracle call
    (Q=20480, k=96) — tiny scattered rows are an HBM worst case, exactly
    like the point-oracle table (:func:`build_point_candidate_grid`).  A
    contiguous (k·9)-float row per query runs in 0.9 ms — 7.4× on the
    whole oracle.  The table MUST stay 2-D: a (g³, k, 3, 3) array tiles
    each trailing (3, 3) into an (8, 128) TPU tile = 21.7 GB of padding;
    (g³, k·9) pads 864 lanes to 896 (+3.7%, 396 MB).
    """
    tv9 = tri_verts.reshape(-1, 9)
    return _table_gather(tv9, cand)


@jax.jit
def _table_gather(tv9, cand):
    # module-level jit: one in-process executable per (T, g³, k) signature —
    # a per-call jax.jit(lambda) would retrace and recompile every build
    g3, k = cand.shape
    return jnp.take(tv9, cand.reshape(-1), axis=0).reshape(g3, k * 9)


def point_triangle_distance_table(
    queries: jax.Array,
    table: jax.Array,
    g: int = CAND_GRID_G,
    lo: float = CAND_GRID_LO,
    hi: float = CAND_GRID_HI,
):
    """Exact-on-candidates unsigned mesh distance via the coordinate table.

    queries: (Q, 3); table: (g³, k·9) from :func:`build_triangle_table`.
    Same candidate sets (hence bit-comparable values) as
    :func:`point_triangle_distance_cells`, but the per-step HBM access is
    one contiguous row per query instead of k scattered triangle rows —
    the shipping mesh-mode training oracle.
    """
    cell = (hi - lo) / g
    k = table.shape[1] // 9
    ci = jnp.clip(
        jnp.floor((queries - lo) / cell).astype(jnp.int32), 0, g - 1
    )
    lin = (ci[:, 0] * g + ci[:, 1]) * g + ci[:, 2]
    rows = table[lin]  # (Q, k·9) contiguous row gather
    tv = rows.reshape(-1, k, 9)
    d2 = _closest_point_sq_dist(
        queries[:, None, :], tv[:, :, 0:3], tv[:, :, 3:6], tv[:, :, 6:9]
    )
    return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))


CAND_PTS_K = 64  # candidate cloud points per cell


def build_point_candidate_indices(
    cloud,
    g: int = CAND_GRID_G,
    k: int = CAND_PTS_K,
    lo: float = CAND_GRID_LO,
    hi: float = CAND_GRID_HI,
) -> "np.ndarray":
    """Host-side index half of :func:`build_point_candidate_grid`:
    (g³, k) int32 numpy indices of the k cloud points nearest each cell
    center (cKDTree; tiny clouds tile up to k).  No device traffic."""
    import numpy as np
    from scipy.spatial import cKDTree

    pts = np.asarray(cloud, np.float32)
    n = len(pts)
    k_out = k
    k = min(k, n)
    centers = _cell_centers(g, lo, hi)
    _, idx = cKDTree(pts).query(centers, k=k, workers=-1)
    if k == 1:
        idx = idx[:, None]
    if idx.shape[1] < k_out:
        # tiny clouds: keep the (g³, k) shape compile-stable by repeating
        # (duplicates are harmless under the min reduction)
        reps = -(-k_out // idx.shape[1])
        idx = np.tile(idx, (1, reps))[:, :k_out]
    return idx.astype(np.int32)


def build_point_candidate_grid(
    cloud,
    g: int = CAND_GRID_G,
    k: int = CAND_PTS_K,
    lo: float = CAND_GRID_LO,
    hi: float = CAND_GRID_HI,
):
    """One-time per-cell nearest-point table for the pc-mode training oracle.

    The point analogue of :func:`build_candidate_grid`: for each cell of a
    g³ lattice over the query domain, the k cloud points nearest the cell
    center (host cKDTree — one-shot index builds belong on the host).
    Unlike the triangle grid this stores the candidate *coordinates*, not
    indices: the per-step oracle is then ONE contiguous (k, 3)-row gather
    per query instead of k scattered point gathers — measured 3.7× faster
    on TPU (1.6 ms vs 6.0 ms for 10k queries; scattered tiny gathers are
    an HBM worst case).  No Q×N matmul at all, so no MXU bf16-vs-f32
    precision trade, and throughput independent of the cloud size.

    Error bound: a query in a cell with center c and half-diagonal h
    returns at most d(q, NN) + 2h even when the true NN misses the list;
    measured on a 100k-point sphere cloud (g=48, k=64): exact on
    near-surface queries, ≤3.3e-3 on 2% of uniform far queries — strictly
    tighter than the ~1e-2 bf16 ranking noise of the matmul sweep it
    replaces (validated against cKDTree in ``tests/test_data.py``).

    Returns table (g³, k, 3) f32 — grid geometry is the module constants.
    """
    import numpy as np

    pts = np.asarray(cloud, np.float32)
    idx = build_point_candidate_indices(pts, g, k, lo, hi)
    return jnp.asarray(pts[idx])  # (g³, k, 3)


def point_cloud_distance_cells(
    queries: jax.Array,
    table: jax.Array,
    g: int = CAND_GRID_G,
    lo: float = CAND_GRID_LO,
    hi: float = CAND_GRID_HI,
):
    """Exact-on-candidates nearest-point distance via the precomputed table.

    queries: (Q, 3); table: (g³, k, 3) from
    :func:`build_point_candidate_grid`.  Runs flat (no lax.map): one
    contiguous row gather plus a (Q, k, 3) elementwise sweep.
    """
    cell = (hi - lo) / g
    ci = jnp.clip(
        jnp.floor((queries - lo) / cell).astype(jnp.int32), 0, g - 1
    )
    lin = (ci[:, 0] * g + ci[:, 1]) * g + ci[:, 2]
    pts = table[lin]  # (Q, k, 3) contiguous row gather
    diff = queries[:, None, :] - pts
    d2 = jnp.min(jnp.sum(diff * diff, axis=2), axis=1)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def winding_number(queries: jax.Array, tri_verts: jax.Array, tile: int = 256):
    """Generalised winding number of each query wrt the mesh (≈1 inside,
    ≈0 outside for watertight meshes).  Solid-angle sum per triangle
    (van Oosterom–Strackee formula)."""
    a = tri_verts[:, 0][None]
    b = tri_verts[:, 1][None]
    c = tri_verts[:, 2][None]

    def one_tile(q):
        pa = a - q[:, None, :]
        pb = b - q[:, None, :]
        pc = c - q[:, None, :]
        la = jnp.linalg.norm(pa, axis=-1)
        lb = jnp.linalg.norm(pb, axis=-1)
        lc = jnp.linalg.norm(pc, axis=-1)
        num = jnp.sum(pa * jnp.cross(pb, pc), axis=-1)
        den = (
            la * lb * lc
            + jnp.sum(pa * pb, axis=-1) * lc
            + jnp.sum(pb * pc, axis=-1) * la
            + jnp.sum(pc * pa, axis=-1) * lb
        )
        omega = 2.0 * jnp.arctan2(num, den)
        return jnp.sum(omega, axis=1) / (4.0 * jnp.pi)

    qn = queries.shape[0]
    if qn <= tile:
        return one_tile(queries)
    if qn % tile:
        pad = tile - qn % tile
        padded = jnp.concatenate([queries, jnp.zeros((pad, 3), queries.dtype)])
        return winding_number(padded, tri_verts, tile)[:qn]
    tiles = queries.reshape(qn // tile, tile, 3)
    return lax.map(one_tile, tiles).reshape(qn)


def signed_mesh_distance(queries: jax.Array, tri_verts: jax.Array, tile: int = 256):
    """Signed distance: negative inside (winding > 0.5), positive outside.

    Open3D ``compute_signed_distance`` analogue used by mesh-mode training
    (``src/dataset.py:35``)."""
    d = point_triangle_distance(queries, tri_verts, tile)
    w = winding_number(queries, tri_verts, tile)
    return jnp.where(w > 0.5, -d, d)


def triangles_from_mesh(vertices, faces) -> jax.Array:
    """Host helper: (V, 3), (F, 3) -> (F, 3, 3) float32 device array."""
    import numpy as np

    tv = np.asarray(vertices, dtype=np.float32)[np.asarray(faces)]
    return jnp.asarray(tv)
