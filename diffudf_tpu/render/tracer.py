"""On-device sphere tracing and hit-point differential geometry.

TPU re-design of ``src/render_st.py:136-172``: the reference marches rays in
4096-point chunks with a host↔device round trip *per iteration* (boolean
indexing of the active set on the CPU).  Here the entire ray tensor lives on
device inside one ``lax.while_loop`` — fixed shapes, per-ray active masks,
early exit when no ray is active — which is the main lever behind the ≥10×
rays/sec target (BASELINE.md).

Hit attributes (normals from the Hessian top eigenvector, principal
directions, mean/gaussian curvature of the *normal field*) are computed in a
second fused pass; the curvature path needs the Jacobian of the
Hessian-eigenvector field — third derivatives of f — obtained by forward-mode
(jacfwd) through the closed-form eigensolver, replacing the reference's
autograd-through-``torch.linalg.eigh`` (``render_st.py:42-62``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..autodiff.eigh3 import eigh3x3
from ..autodiff.ops import value, value_grad, value_grad_hessian
from ..fields.siren import SirenSpec
from ..fields.transforms import inverse_map


def _march_while(params, spec, origins, rays, active0, *, gt_mode, alpha,
                 surface_threshold, max_iterations, compute_dtype):
    """The core masked march as one ``lax.while_loop`` (traced body)."""

    def cond(carry):
        t0, active, hits, it = carry
        return jnp.logical_and(it < max_iterations, jnp.any(active))

    def body(carry):
        t0, active, hits, it = carry
        f = value(params, spec, t0, compute_dtype=compute_dtype)
        steps = inverse_map(gt_mode, jnp.abs(f), alpha)
        t1 = t0 + rays * steps[:, None]
        t0 = jnp.where(active[:, None], t1, t0)

        if gt_mode == "siren":
            thresh = f < surface_threshold
        else:
            thresh = jnp.abs(steps) < surface_threshold
        in_domain = jnp.all((t0 > -1.0) & (t0 < 1.0), axis=-1)
        hits = hits | (active & thresh & in_domain)
        active = active & ~thresh & in_domain
        return t0, active, hits, it + 1

    init = (
        origins.astype(jnp.float32),
        active0,
        # derive from the input so the carry keeps the same varying-axes
        # type under shard_map (a fresh constant would be unvarying)
        active0 & False,
        jnp.int32(0),
    )
    t0, active, hits, it = lax.while_loop(cond, body, init)
    return t0, hits, it


@partial(
    jax.jit,
    static_argnames=("spec", "gt_mode", "max_iterations", "fast", "mesh"),
)
def trace_rays(
    params,
    spec: SirenSpec,
    origins,  # (N, 3) entry points into the domain
    rays,  # (N, 3) unit directions
    active0,  # (N,) bool: rays that entered the domain
    *,
    gt_mode: str,
    alpha: float,
    surface_threshold: float,
    max_iterations: int = 100,
    fast: bool = True,
    mesh=None,
):
    """March ``t ← t + ray · inverse(|f(t)|)`` until convergence.

    Returns (positions (N, 3), hits (N,) bool, iterations used).
    Reference loop semantics (``render_st.py:136-161``): a ray hits when its
    step (or field value, in siren mode) drops below the threshold while
    still inside [-1, 1]³; it dies when it leaves the domain.

    ``fast=True`` runs the march's field evaluations in mixed bf16 (f32
    first layer + accumulation); positions stay f32.  Step-length error is
    ≲1%, well inside the convergence tolerance of the march.

    With ``mesh`` the ray axis is sharded over the ``data`` axis
    (``shard_map``; params replicated, no collectives — rays are
    independent) and each device marches its own shard, exiting as soon as
    *its* rays converge.  N must be divisible by ``mesh.size``; per-ray
    results are bit-identical to the single-device march.
    """
    compute_dtype = jnp.bfloat16 if fast else None
    kw = dict(
        gt_mode=gt_mode, alpha=alpha, surface_threshold=surface_threshold,
        max_iterations=max_iterations, compute_dtype=compute_dtype,
    )
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        def local(params, o, r, a):
            t0, hits, it = _march_while(params, spec, o, r, a, **kw)
            return t0, hits, it[None]

        t0, hits, its = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(DATA_AXIS)),
        )(params, origins, rays, active0)
        return t0, hits, jnp.max(its)
    return _march_while(params, spec, origins, rays, active0, **kw)


def _pallas_value_ok(spec) -> bool:
    return (
        spec.activation == "sine"
        and len(set(spec.hidden)) == 1
        and jax.default_backend() == "tpu"
    )


@partial(
    jax.jit,
    static_argnames=("spec", "gt_mode", "segment", "fast", "use_pallas",
                     "relaxation"),
)
def _trace_segment(params, spec, t0, rays, active, hits, *, gt_mode, alpha,
                   surface_threshold, segment, fast, use_pallas=False,
                   relaxation: float = 1.0):
    """``segment`` march iterations over a compact ray bucket; returns the
    updated (t0, active, hits).

    Iterations are python-unrolled so the Pallas value kernel sits at the
    top level of the jit (nesting pallas inside lax loops is pathological
    for the remote TPU compiler).

    ``relaxation`` ω > 1 enables over-relaxed sphere tracing (Keinert et
    al. 2014), one field eval per iteration: march ω·d; if the next
    unbounding sphere fails to overlap the previous one
    (d_new < (ω−1)·d_prev) the surface may sit in the uncovered gap, so
    the ray reverts to the conservative position t_prev + d_prev and
    re-marches from there.  Convergence (hit) checks only fire on
    non-reverted evaluations, so the hit criterion is unchanged.
    """
    compute_dtype = jnp.bfloat16 if fast else None
    if use_pallas:
        from ..ops.pallas_value import value_pallas

    def field(pts):
        if use_pallas:
            return value_pallas(params, spec, pts)
        return value(params, spec, pts, compute_dtype=compute_dtype)

    omega = float(relaxation)
    prev_d = jnp.zeros(t0.shape[0], t0.dtype)  # conservative step last taken
    for _ in range(segment):
        f = field(t0)
        d = inverse_map(gt_mode, jnp.abs(f), alpha)
        if omega > 1.0:
            fail = active & (d < (omega - 1.0) * prev_d)
            # revert to the conservative position t_prev + d_prev·ray
            t0 = jnp.where(
                fail[:, None], t0 - rays * ((omega - 1.0) * prev_d)[:, None], t0
            )
            adv = jnp.where(fail, 0.0, omega * d)
            valid_eval = ~fail
            prev_d = jnp.where(fail, 0.0, d)
        else:
            adv = d
            valid_eval = jnp.ones_like(active)
            prev_d = d
        t1 = t0 + rays * adv[:, None]
        t0 = jnp.where(active[:, None], t1, t0)
        if gt_mode == "siren":
            thresh = valid_eval & (f < surface_threshold)
        else:
            thresh = valid_eval & (jnp.abs(d) < surface_threshold)
        in_domain = jnp.all((t0 > -1.0) & (t0 < 1.0), axis=-1)
        hits = hits | (active & thresh & in_domain)
        active = active & ~thresh & in_domain
    return t0, active, hits


@partial(jax.jit, static_argnames=("bucket",))
def _compact(t0, rays, active, bucket):
    """Gather the ≤bucket active rays to the front (device-side).

    Returns (t0_b, rays_b, act_b, perm) with static shapes; perm indexes the
    full arrays for the scatter-back.
    """
    order = jnp.argsort(~active)  # actives first, stable
    perm = order[:bucket]
    return t0[perm], rays[perm], active[perm], perm


@partial(jax.jit, donate_argnums=(3, 4))
def _scatter_back(perm, t0_b, hit_b, t0, hits):
    t0 = t0.at[perm].set(t0_b)
    hits = hits.at[perm].set(hits[perm] | hit_b)
    return t0, hits


def trace_rays_compacted(
    params,
    spec: SirenSpec,
    origins,
    rays,
    active0,
    *,
    gt_mode: str,
    alpha: float,
    surface_threshold: float,
    max_iterations: int = 100,
    segment: int = 8,
    fast: bool = True,
    relaxation: float = 1.0,
):
    """March with periodic *on-device* active-ray compaction.

    Field evaluation is the march's entire cost (sin-transcendental bound),
    and in the fixed-shape while_loop converged/dead rays keep paying it.
    Here the march runs in ``segment``-iteration bursts; between bursts the
    still-active rays are gathered to the front of a power-of-two bucket
    (bounded compile-cache growth) *on device* — only the active count (one
    scalar) crosses to the host, which matters on remote-TPU platforms
    where host↔device transfers are expensive.  Total field evaluations
    shrink to ~Σ active(t) instead of N·iterations.

    Host synchronisation is *pipelined*: while the active set is large the
    loop blocks on the exact count (compaction wins dominate), but once the
    bucket is small the count read of segment *i* resolves while segment
    *i+1* already runs on device — a slightly stale count is still a valid
    bucket bound because the active set only shrinks.  On remote-TPU
    platforms the per-segment round-trip latency otherwise dominates the
    tail of the march.

    Same contract/result as :func:`trace_rays`; returns numpy
    (positions, hits, iterations).
    """
    n_real = origins.shape[0]
    # pad to a multiple of 1024 so every power-of-two bucket divides the
    # pallas value kernel's tile
    n = ((n_real + 1023) // 1024) * 1024
    pad = n - n_real
    active_np = np.concatenate([np.asarray(active0, bool), np.zeros(pad, bool)])
    count = int(active_np.sum())  # exact initial count, free (host-side)
    t0 = jnp.asarray(
        np.concatenate([origins, np.zeros((pad, 3), np.float32)]), jnp.float32
    )
    rays_d = jnp.asarray(
        np.concatenate([rays, np.zeros((pad, 3), np.float32)]), jnp.float32
    )
    active = jnp.asarray(active_np)
    hits = jnp.zeros(n, bool)
    it = 0
    pending = None  # in-flight count read from an earlier segment
    while it < max_iterations and count > 0:
        bucket = min(n, max(1024, 1 << int(np.ceil(np.log2(count)))))
        t0_b, rays_b, act_b, perm = _compact(t0, rays_d, active, bucket)
        hit_b = jnp.zeros(bucket, bool)
        t0_b, act_b, hit_b = _trace_segment(
            params, spec, t0_b, rays_b, act_b, hit_b,
            gt_mode=gt_mode, alpha=alpha,
            surface_threshold=surface_threshold,
            segment=min(segment, max_iterations - it), fast=fast,
            use_pallas=_pallas_value_ok(spec), relaxation=relaxation,
        )
        t0, hits = _scatter_back(perm, t0_b, hit_b, t0, hits)
        active = active.at[perm].set(act_b)
        it += segment
        post_count = jnp.sum(active)
        if count > n // 8:
            # large active set: exact buckets are worth a blocking sync
            count = int(post_count)
            pending = None
        else:
            # small active set: use the oldest *resolved* count (a stale
            # count only over-sizes the bucket, never drops rays; keeping
            # the oldest outstanding read guarantees it eventually resolves
            # even when the host dispatches ahead of the device)
            if pending is None:
                pending = post_count
            elif pending.is_ready():
                count = int(pending)
                pending = post_count
    return np.asarray(t0)[:n_real], np.asarray(hits)[:n_real], it


def gradient_descent_refine(
    params, spec, positions, mask, *, gt_mode, alpha, steps: int
):
    """Optional post-march refinement ``t ← t − ∇̂f · inverse(f)``
    (``render_st.py:163-172``)."""
    if steps == 0:
        return positions

    def body(i, t0):
        f, g = value_grad(params, spec, t0)
        gn = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        step = inverse_map(gt_mode, jnp.abs(f), alpha)
        t1 = t0 - gn * step[:, None]
        return jnp.where(mask[:, None], t1, t0)

    return lax.fori_loop(0, steps, body, positions)


def _normal_field(params, spec, x):
    """Unit Hessian-top-eigenvector field n(x) — differentiable."""
    _, _, h = value_grad_hessian(params, spec, x)
    _, vecs = eigh3x3(h)
    return vecs[..., 2]


@partial(jax.jit, static_argnames=("spec", "curvature_mode", "tile"))
def hit_attributes(
    params,
    spec: SirenSpec,
    positions,  # (N, 3) hit points (padded to tile multiple by caller)
    *,
    curvature_mode: str = "none",  # 'none' | 'mean' | 'gaussian'
    tile: int = 4096,
):
    """-> dict with normals (N,3), pc1 (N,3), pc2 (N,3) [, curvature (N,)].

    normals = Hessian top eigenvector; pc1/pc2 = the other two eigenvectors
    (principal-direction proxies used by Ward shading, ``render_st.py:57-62``).
    Curvature follows the reference's shape-operator form on the normal
    field: mean = ½ tr(∂n/∂x), gaussian = −det of the bordered Jacobian
    (``render_st.py:42-55``).
    """
    n = positions.shape[0]

    if curvature_mode == "none":
        # fast path: fused (pallas-backed on TPU) Hessian eval + eigh
        from ..ops.evaluate import evaluate_field

        ev = evaluate_field(params, spec, positions, want_hess=True, tile=tile)
        _, vecs = eigh3x3(ev.hess)
        return {
            "normals": vecs[..., 2],
            "pc1": vecs[..., 0],
            "pc2": vecs[..., 1],
            "curvature": jnp.zeros(n),
        }

    tiles = positions.reshape(n // tile, tile, 3)

    def one(pts):
        _, _, h = value_grad_hessian(params, spec, pts)
        _, vecs = eigh3x3(h)
        normals = vecs[..., 2]
        out = {"normals": normals, "pc1": vecs[..., 0], "pc2": vecs[..., 1]}

        def nf(p):
            return _normal_field(params, spec, p[None, :])[0]

        jac = jax.vmap(jax.jacfwd(nf))(pts)  # (tile, 3, 3)
        if curvature_mode == "mean":
            curv = 0.5 * jnp.trace(jac, axis1=-2, axis2=-1)
        else:  # gaussian: bordered-Jacobian determinant
            F = jnp.zeros((pts.shape[0], 4, 4))
            F = F.at[:, :3, :3].set(jac)
            F = F.at[:, :3, 3].set(normals)
            F = F.at[:, 3, :3].set(normals)
            curv = -jnp.linalg.det(F)
        out["curvature"] = curv
        return out

    outs = lax.map(one, tiles)
    return {k: v.reshape(n, *v.shape[2:]) for k, v in outs.items()}
