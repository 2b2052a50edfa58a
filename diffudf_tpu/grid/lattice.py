"""Dense N³ lattice evaluation → pseudo-UDF + direction field.

TPU re-design of the reference grid extraction (``src/render_mc.py:20-101``):
the lattice is generated on device, evaluated with the fused (f, ∇f, H) tile
map (sharded across chips on a mesh), and converted to

  * ``udf``  — inverse-mapped pseudo Euclidean distance |g⁻¹(|f|)|,
  * ``dirs`` — unit direction field: −∇f/|∇f| where the gradient is
    informative, else the Hessian top eigenvector sign-aligned with −∇f
    (the paper's near-surface fallback where ∇(UDF) vanishes).

Grid memory layout matches the reference: ``udf[i, j, k]`` at coordinate
(x_i, y_j, z_k), x slowest / z fastest, over [-1, 1]³ with spacing 2/(N−1).

Deviation (documented): the reference checks the gradient-norm threshold
*after* normalising the gradient (``render_mc.py:75,86``), which makes the
Hessian fallback unreachable except at exactly-zero gradients; we apply the
intended pre-normalisation threshold ``|∇f| < 0.04`` — the behaviour of the
reference's own slice renderer (``generate_df.py:84,96-100``) and of the
paper.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..autodiff.eigh3 import top_eigenvector
from ..fields.siren import SirenSpec
from ..utils.buckets import next_bucket
from ..fields.transforms import inverse_map
from ..ops.evaluate import evaluate_field

GRAD_NORM_THRESHOLD = 0.04


def lattice_points(N: int, origin: float = -1.0, extent: float = 2.0) -> jax.Array:
    """(N³, 3) lattice, x slowest / z fastest, float32, built on device."""
    axis = origin + extent / (N - 1) * jnp.arange(N, dtype=jnp.float32)
    x, y, z = jnp.meshgrid(axis, axis, axis, indexing="ij")
    return jnp.stack([x.ravel(), y.ravel(), z.ravel()], axis=-1)


def direction_field(grad, hess, threshold: float = GRAD_NORM_THRESHOLD):
    """Unit directions toward the surface from (∇f, H): (Q,3),(Q,3,3)->(Q,3)."""
    gnorm = jnp.linalg.norm(grad, axis=-1, keepdims=True)
    ndir = -grad / jnp.maximum(gnorm, 1e-12)
    hnormal = top_eigenvector(hess)
    # sign-align the eigenvector with the inward gradient direction
    sign = jnp.where(jnp.sum(ndir * hnormal, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    hnormal = sign * hnormal
    return jnp.where(gnorm < threshold, hnormal, ndir)


def extract_fields(
    params,
    spec: SirenSpec,
    N: int,
    gt_mode: str,
    alpha: float,
    *,
    mesh=None,
    tile: int = 8192,
    deriv_dtype=jnp.bfloat16,
    use_pallas=None,
):
    """-> (udf (N, N, N) f32, dirs (N, N, N, 3) f32), both on device.

    ``deriv_dtype`` defaults to bf16 here: the direction field only needs
    directional accuracy (~0.4% noise ≪ voxel effects) and the value path
    (which sets vertex positions via the pseudo-UDF) stays f32 regardless.
    """
    pts = lattice_points(N)
    ev = evaluate_field(
        params, spec, pts, want_grad=True, want_hess=True, tile=tile, mesh=mesh,
        deriv_dtype=deriv_dtype, use_pallas=use_pallas,
    )
    udf = inverse_map(gt_mode, jnp.abs(ev.f), alpha)
    dirs = direction_field(ev.grad, ev.hess)
    return udf.reshape(N, N, N), dirs.reshape(N, N, N, 3)


@partial(jax.jit, static_argnames=("N",))
def _decode_points(idx, N: int):
    """Flat lattice indices (int32) -> (M, 3) world coordinates, on device.

    Uploading M indices instead of M×3 coordinates cuts the host→device
    transfer of the sparse path by 3× (it matters on tunneled platforms).
    """
    h = 2.0 / (N - 1)
    i = idx // (N * N)
    j = (idx // N) % N
    k = idx % N
    return -1.0 + h * jnp.stack([i, j, k], axis=-1).astype(jnp.float32)


@partial(jax.jit, static_argnames=("Nc", "s", "N", "cap"))
def _active_indices_device(ud_c, thresh, Nc: int, s: int, N: int, cap: int):
    """Recompute the active-band vertex indices ON DEVICE (ascending).

    The host derives the same index list from its copy of the coarse
    values; recomputing on device (8 shifted mins + repeat + a stable
    argsort of the mask) means no multi-MB index upload crosses the
    tunnel.  The first M entries of the stable argsort are exactly
    ``np.flatnonzero(vmask)`` — ascending original order among equal keys.
    """
    u = ud_c.reshape(Nc, Nc, Nc)
    cmin = u[:-1, :-1, :-1]
    for di, dj, dk in _CORNERS[1:]:
        cmin = jnp.minimum(
            cmin, u[di : di + Nc - 1, dj : dj + Nc - 1, dk : dk + Nc - 1]
        )
    active = cmin <= thresh
    cell = jnp.repeat(jnp.repeat(jnp.repeat(active, s, 0), s, 1), s, 2)
    vmask = jnp.zeros((N, N, N), bool)
    for di, dj, dk in _CORNERS:
        vmask = vmask.at[di : di + N - 1, dj : dj + N - 1, dk : dk + N - 1].set(
            vmask[di : di + N - 1, dj : dj + N - 1, dk : dk + N - 1] | cell
        )
    order = jnp.argsort(~vmask.ravel(), stable=True)
    return order[:cap].astype(jnp.int32)


@partial(jax.jit, static_argnames=("cap2",))
def _select_indices_device(idx_dev, ud_v, m, band, cap2: int):
    """Device-side stage-3 selection: indices whose exact value is in the
    dirs band, ascending — matching the host's ``idx[sel]`` order."""
    valid = (jnp.arange(idx_dev.shape[0]) < m) & (ud_v <= band)
    order = jnp.argsort(~valid, stable=True)
    return idx_dev[order[:cap2]]


_CORNERS = [(di, dj, dk) for di in (0, 1) for dj in (0, 1) for dk in (0, 1)]


def _bucket_cap(m: int, floor: int = 4096) -> int:
    """Smallest power-of-4 bucket ≥ m (shape-bucketing, see gather_rows)."""
    return next_bucket(m, floor, factor=4)


def extract_fields_sparse(
    params,
    spec: SirenSpec,
    N: int,
    gt_mode: str,
    alpha: float,
    *,
    mesh=None,
    tile: int = 8192,
    deriv_dtype=jnp.bfloat16,
    band_voxels: float = 4.0,
    dirs_band_voxels: float = 3.5,
    coarse_stride: int | None = None,
    safety: float = 1.5,
    use_pallas=None,
    cap_threshold: float | None = None,
):
    """Hierarchical (coarse → band-refined) field extraction → host numpy.

    Same contract as :func:`extract_fields` but returns **numpy** arrays and
    evaluates the expensive fused (f, ∇f, H) pass only inside a thin band
    around the surface.  Every downstream consumer (MeshUDF gates at
    1.75 voxels, the 2-voxel signing band, CAP's 0.008 min-corner gate,
    the centroid-distance face filter — all bounded by ~3 voxels) reads
    exact values; vertices farther out get a constant background above
    every gate threshold.

    Stages (all field evals on device, sharded over ``mesh`` when given):

      1. value-only pass on the stride-``s`` sub-lattice (which coincides
         with the fine lattice), giving a coarse pseudo-UDF;
      2. blocks of s³ cells whose min corner exceeds ``band + margin`` are
         provably surface-free (the pseudo-UDF is 1-Lipschitz up to fit
         noise; ``margin = safety·(s·h·√3/2) + 2h`` absorbs both the
         block half-diagonal and the noise) and are skipped; value-only
         pass on the remaining fine vertices;
      3. fused (f, ∇f, H) + direction-field pass only where the *exact*
         value sits within ``dirs_band_voxels`` — the only vertices whose
         directions any consumer reads.

    At N=256 on a fitted shape this evaluates ~5-15% of the 16.7M lattice
    with the Hessian pass reduced ~30×, and shrinks the device→host
    transfer from 267 MB (full udf+dirs) to the in-band values.
    """
    h = 2.0 / (N - 1)
    s = coarse_stride
    if s is None:
        for cand in (6, 5, 4, 7, 3, 8, 2):
            if (N - 1) % cand == 0 and (N - 1) // cand >= 8:
                s = cand
                break
    if not s or s == 1:
        udf, dirs = extract_fields(
            params, spec, N, gt_mode, alpha, mesh=mesh, tile=tile,
            deriv_dtype=deriv_dtype, use_pallas=use_pallas,
        )
        return np.asarray(udf), np.asarray(dirs)

    Nc = (N - 1) // s + 1
    # stage 1: coarse sub-lattice values (coincides with the fine lattice)
    evc = evaluate_field(params, spec, lattice_points(Nc), tile=tile, mesh=mesh)
    ud_c_dev = inverse_map(gt_mode, jnp.abs(evc.f), alpha)
    ud_c = np.asarray(ud_c_dev, np.float32).reshape(Nc, Nc, Nc)

    # CAP's cell gate is *absolute* (min corner < threshold,
    # ``render_mc.py:213``) and its vote signing reads corner dirs out to
    # ``threshold + 2.0·h`` (``extract.cap._vote_signs`` max gate); at very
    # fine grids that reach exceeds a fixed voxel count, so the bands adapt
    # to cover it.  Callers running CAP with a custom threshold must pass
    # it here so the sparse band still covers the vote gates.
    if cap_threshold is None:
        from ..extract.cap import CAP_THRESHOLD as cap_threshold
    dirs_band = max(dirs_band_voxels * h, cap_threshold + 2.0 * h)
    band = max(band_voxels * h, dirs_band + 0.5 * h)
    margin = safety * (s * h * np.sqrt(3.0) / 2.0) + 2.0 * h
    # host and device MUST compare against bit-identical f32 thresholds:
    # the host numpy masks decide scatter positions for device-computed
    # index lists, so a value in the f32 rounding window of a float64
    # threshold would silently misalign every later scatter
    band_thresh = np.float32(band + margin)
    dirs_thresh = np.float32(dirs_band)
    background = band_thresh

    cmin = ud_c[:-1, :-1, :-1].copy()
    for di, dj, dk in _CORNERS[1:]:
        np.minimum(
            cmin,
            ud_c[di : di + Nc - 1, dj : dj + Nc - 1, dk : dk + Nc - 1],
            out=cmin,
        )
    active = cmin <= band_thresh  # (Nc-1,)³ surface-possible blocks
    if not active.any():
        # no surface found at coarse scale — degenerate field; stay exact
        udf, dirs = extract_fields(
            params, spec, N, gt_mode, alpha, mesh=mesh, tile=tile,
            deriv_dtype=deriv_dtype, use_pallas=use_pallas,
        )
        return np.asarray(udf), np.asarray(dirs)

    # stage 2: exact values at every vertex of an active block.  The host
    # derives the index list from its coarse copy for the final scatter;
    # the device recomputes the identical list from its own coarse values
    # (no multi-MB index upload), padded to power-of-4 buckets so band
    # sizes that vary per shape/resolution share a small executable set.
    cell_active = active.repeat(s, 0).repeat(s, 1).repeat(s, 2)  # (N-1)³
    vmask = np.zeros((N, N, N), bool)
    for di, dj, dk in _CORNERS:
        vmask[di : di + N - 1, dj : dj + N - 1, dk : dk + N - 1] |= cell_active
    idx = np.flatnonzero(vmask.ravel()).astype(np.int32)
    cap = _bucket_cap(len(idx))
    idx_dev = _active_indices_device(
        ud_c_dev, jnp.asarray(band_thresh), Nc, s, N, cap
    )
    ud_v_dev = inverse_map(
        gt_mode,
        jnp.abs(
            evaluate_field(
                params, spec, _decode_points(idx_dev, N), tile=tile, mesh=mesh
            ).f
        ),
        alpha,
    )
    ud_v = np.asarray(ud_v_dev, np.float32)[: len(idx)]

    # stage 3: directions only where the exact value needs them
    sel = ud_v <= dirs_thresh
    dirs_flat = np.zeros((N * N * N, 3), np.float32)
    idx2 = idx[sel]
    if idx2.size:
        idx2_dev = _select_indices_device(
            idx_dev, ud_v_dev, jnp.int32(len(idx)), jnp.asarray(dirs_thresh),
            _bucket_cap(len(idx2)),
        )
        ev2 = evaluate_field(
            params, spec, _decode_points(idx2_dev, N),
            want_grad=True, want_hess=True, tile=tile, mesh=mesh,
            deriv_dtype=deriv_dtype, use_pallas=use_pallas,
        )
        dirs_flat[idx2] = np.asarray(
            direction_field(ev2.grad, ev2.hess), np.float32
        )[: len(idx2)]

    udf_flat = np.full(N * N * N, background, np.float32)
    udf_flat[idx] = ud_v
    return udf_flat.reshape(N, N, N), dirs_flat.reshape(N, N, N, 3)


def extract_sdf_grid(params, spec: SirenSpec, N: int, *, mesh=None, tile: int = 8192):
    """Raw field values on the lattice (signed-MC baseline path,
    ``src/render_mc.py:314-358``)."""
    pts = lattice_points(N)
    ev = evaluate_field(params, spec, pts, tile=tile, mesh=mesh)
    return ev.f.reshape(N, N, N)
