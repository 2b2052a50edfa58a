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
from ..utils.buckets import next_bucket
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


def _trace_segment_body(params, spec, t0, rays, active, hits, *, gt_mode,
                        alpha, surface_threshold, segment, fast,
                        use_pallas=False, relaxation: float = 1.0):
    """``segment`` march iterations over a compact ray bucket; returns the
    updated (t0, active, hits).  Traced inside :func:`_march_round`.

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
            return value_pallas(params, spec, pts, compute_dtype=compute_dtype)
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
            # an over-relaxed step that would leave [-1,1]³ must fall back
            # to the conservative step (if that stays inside) — the domain
            # test below would otherwise kill the ray before the next
            # iteration's revert logic could rescue the overshoot
            cons = jnp.where(fail, 0.0, d)
            over_out = ~jnp.all(
                jnp.abs(t0 + rays * adv[:, None]) < 1.0, axis=-1
            )
            cons_in = jnp.all(
                jnp.abs(t0 + rays * cons[:, None]) < 1.0, axis=-1
            )
            clamp = active & over_out & cons_in
            adv = jnp.where(clamp, cons, adv)
            valid_eval = ~fail
            # a conservative step gives the next overlap test no relaxed
            # span to check — treat it like a post-revert step
            prev_d = jnp.where(fail | clamp, 0.0, d)
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


@partial(
    jax.jit,
    static_argnames=("spec", "gt_mode", "bucket", "segment", "fast",
                     "use_pallas", "relaxation"),
    donate_argnums=(2, 4, 5),
)
def _march_round(params, spec, t0, rays, active, hits, *, gt_mode, alpha,
                 surface_threshold, bucket, segment, fast, use_pallas,
                 relaxation):
    """One fused round: compact the ≤bucket active rays to the front, march
    ``segment`` iterations on the bucket, scatter back, and return the new
    active count — a single executable dispatch.  On remote-TPU platforms
    every dispatch is an RPC, and the previous 4-dispatch round (compact /
    march / scatter / count) was latency-bound end to end."""
    order = jnp.argsort(~active)  # actives first, stable
    perm = order[:bucket]
    t0_b, rays_b, act_b = t0[perm], rays[perm], active[perm]
    hit_b = jnp.zeros(bucket, bool)
    t0_b, act_b, hit_b = _trace_segment_body(
        params, spec, t0_b, rays_b, act_b, hit_b,
        gt_mode=gt_mode, alpha=alpha, surface_threshold=surface_threshold,
        segment=segment, fast=fast, use_pallas=use_pallas,
        relaxation=relaxation,
    )
    t0 = t0.at[perm].set(t0_b)
    hits = hits.at[perm].set(hits[perm] | hit_b)
    active = active.at[perm].set(act_b)
    return t0, active, hits, jnp.sum(active)


def _bucket_for(count: int, n: int) -> int:
    """Smallest power-of-4 bucket ≥ count (floor 1024, cap n).

    Coarse (×4) granularity keeps the set of compiled round executables
    small — on remote platforms every new (bucket, segment) shape is a
    20-40 s XLA compile, which dwarfs the ≤4× extra evals of an oversized
    bucket on the small late-march rounds.
    """
    return next_bucket(count, 1024, factor=4, cap=n)


def warmup_compacted(
    params,
    spec: SirenSpec,
    n_rays: int,
    *,
    gt_mode: str,
    alpha: float,
    surface_threshold: float,
    max_iterations: int = 100,
    segment: int = 8,
    fast: bool = True,
    relaxation: float = 1.0,
):
    """Pre-compile every (bucket, segment) round the compacted march can
    visit for an ``n_rays`` trace — different runs visit different bucket
    sequences (the active-set decay is data-dependent), and a cold compile
    inside a render/benchmark loop costs far more than this sweep."""
    n = ((n_rays + 1023) // 1024) * 1024
    buckets = set()
    b = 1024
    while b < n:
        buckets.add(b)
        b *= 4
    buckets.add(n)
    segments = {segment}
    if max_iterations % segment:
        segments.add(max_iterations % segment)
    t0 = jnp.zeros((n, 3), jnp.float32)
    rays = jnp.zeros((n, 3), jnp.float32)
    active = jnp.zeros(n, bool)
    hits = jnp.zeros(n, bool)
    for bk in sorted(buckets):
        for seg in sorted(segments):
            t0, active, hits, _ = _march_round(
                params, spec, t0, rays, active, hits,
                gt_mode=gt_mode, alpha=alpha,
                surface_threshold=surface_threshold, bucket=bk, segment=seg,
                fast=fast, use_pallas=_pallas_value_ok(spec),
                relaxation=relaxation,
            )
    from ..utils.timing import force_sync

    force_sync(t0)  # block_until_ready returns early on the axon platform


def gather_rows(arr, idx: np.ndarray, floor: int = 1024) -> np.ndarray:
    """Materialise ``arr[idx]`` on host with shape-bucketed gathers.

    A gather whose index length varies per call compiles a fresh executable
    every time (3+ s on remote platforms); padding the index vector to a
    power-of-4 bucket keeps the executable set tiny.  The padded rows (index
    0) are sliced off before returning.
    """
    m = len(idx)
    if m == 0:
        return np.zeros((0,) + tuple(arr.shape[1:]), np.dtype(arr.dtype))
    cap = next_bucket(m, floor, factor=4)
    idx_p = np.zeros(cap, np.int64)
    idx_p[:m] = idx
    return np.asarray(arr[jnp.asarray(idx_p)])[:m]


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
    pipeline_below: float = 0.0,
    return_device: bool = False,
    use_pallas: bool | None = None,
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

    Each round (compact + ``segment`` iterations + scatter + count) is a
    single fused executable — one dispatch per round, which matters on
    remote platforms where every dispatch is an RPC.  ``pipeline_below``
    optionally overlaps the count read with the next round once the active
    fraction drops below it (a stale count is still a valid bucket bound
    because the active set only shrinks); with fused rounds the blocking
    read is usually just as fast, so the default stays synchronous.

    ``use_pallas``: None (default) auto-selects the Pallas value kernel on
    TPU — fastest warm, but every (bucket, segment) round is a fresh
    remote compile that bypasses the persistent cache (~1 min each).
    One-shot callers (the ST CLI) pass False: the XLA march is ~2-3×
    slower per eval but compiles once ever thanks to the persistent cache.

    Same contract/result as :func:`trace_rays`; returns numpy
    (positions, hits, iterations) — or device arrays with
    ``return_device=True``, which skips the full-frame positions download
    (~300 ms for 720² rays on a tunneled platform; callers typically gather
    only the hit rows).  Device-array inputs are padded on device, avoiding
    the mirror-image host→device upload.
    """
    n_real = origins.shape[0]
    # pad to a multiple of 1024 so every power-of-two bucket divides the
    # pallas value kernel's tile
    n = ((n_real + 1023) // 1024) * 1024
    pad = n - n_real
    on_device = isinstance(origins, jax.Array) and not isinstance(
        origins, np.ndarray
    )
    if on_device:
        rays_d = jnp.asarray(rays, jnp.float32)
        if pad:
            t0 = jnp.concatenate(
                [jnp.asarray(origins, jnp.float32),
                 jnp.zeros((pad, 3), jnp.float32)]
            )
            rays_d = jnp.concatenate([rays_d, jnp.zeros((pad, 3), jnp.float32)])
            active = jnp.concatenate(
                [jnp.asarray(active0, bool), jnp.zeros(pad, bool)]
            )
        else:
            # the march donates its position/active buffers — copy so the
            # caller's arrays survive
            t0 = jnp.array(origins, jnp.float32, copy=True)
            active = jnp.array(active0, bool, copy=True)
        count = int(jnp.sum(active))  # one scalar sync
    else:
        active_np = np.concatenate(
            [np.asarray(active0, bool), np.zeros(pad, bool)]
        )
        count = int(active_np.sum())  # exact initial count, free (host-side)
        t0 = jnp.asarray(
            np.concatenate([origins, np.zeros((pad, 3), np.float32)]),
            jnp.float32,
        )
        rays_d = jnp.asarray(
            np.concatenate([rays, np.zeros((pad, 3), np.float32)]), jnp.float32
        )
        active = jnp.asarray(active_np)
    hits = jnp.zeros(n, bool)
    it = 0
    pending = None  # in-flight count read from an earlier round
    while it < max_iterations and count > 0:
        bucket = _bucket_for(count, n)
        t0, active, hits, post_count = _march_round(
            params, spec, t0, rays_d, active, hits,
            gt_mode=gt_mode, alpha=alpha,
            surface_threshold=surface_threshold, bucket=bucket,
            segment=min(segment, max_iterations - it), fast=fast,
            use_pallas=(
                _pallas_value_ok(spec) if use_pallas is None else use_pallas
            ),
            relaxation=relaxation,
        )
        it += min(segment, max_iterations - it)
        if count > n * pipeline_below:
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
    if return_device:
        return t0[:n_real], hits[:n_real], it
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


@partial(jax.jit, static_argnames=("spec", "curvature_mode", "tile", "use_pallas"))
def hit_attributes(
    params,
    spec: SirenSpec,
    positions,  # (N, 3) hit points (padded to tile multiple by caller)
    *,
    curvature_mode: str = "none",  # 'none' | 'mean' | 'gaussian'
    tile: int = 4096,
    use_pallas: bool | None = None,
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

        ev = evaluate_field(params, spec, positions, want_hess=True, tile=tile,
                            use_pallas=use_pallas)
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
