"""Ground-truth field transforms g(d) and their inverses d = g⁻¹(f).

The DUDF trick: instead of regressing the raw unsigned distance d(x), the
network fits a *scaled* field g(d).  Three modes (reference ``src/inverses.py``
and the closed forms in ``generate_df.py:111-122``):

  * ``tanh``:    g(d) = d·tanh(α·d)          |∇g| = tanh(αd) + αd(1-tanh²(αd))
  * ``squared``: g(d) = α·d²                 |∇g| = 2αd
  * ``siren``:   g(d) = d (signed SDF)       |∇g| = 1

``inverse_map`` maps a *predicted* field value back to a Euclidean step length
for sphere tracing / projection / pseudo-UDF grids (``src/inverses.py:3-22``):

  * tanh:    d ≈ sqrt(f/α) when f < 1/α else f
  * squared: d = sqrt(f/α) where f > 0 else min_step
  * siren:   d = f where f > 0 else min_step

All functions are jnp-traced, shape-preserving, NaN-free for f >= 0 and usable
inside jit / while_loop / shard_map.
"""

from __future__ import annotations

import jax.numpy as jnp

VALID_MODES = ("tanh", "squared", "siren")


def _check(mode: str):
    if mode not in VALID_MODES:
        raise ValueError(f"gt_mode must be one of {VALID_MODES}, got {mode!r}")


def gt_transform(mode: str, d, alpha: float):
    """g(d): the target field value at ground-truth (signed or unsigned) distance d.

    tanh/squared are even in d, so signed and unsigned ground truth coincide —
    the property the reference relies on when training from signed mesh
    distance (``src/dataset.py:35``) with the tanh loss.
    """
    _check(mode)
    if mode == "tanh":
        return d * jnp.tanh(alpha * d)
    if mode == "squared":
        return alpha * d * d
    return d


def gt_grad_norm(mode: str, d, alpha: float):
    """|∇g|(d): target gradient norm at distance d (d taken as unsigned)."""
    _check(mode)
    if mode == "tanh":
        t = jnp.tanh(alpha * d)
        return jnp.abs(t + alpha * d * (1.0 - t * t))
    if mode == "squared":
        return 2.0 * alpha * d
    return jnp.ones_like(d)


def inverse_map(mode: str, f, alpha: float, min_step: float = 0.01):
    """Euclidean step length from a predicted field value f.

    Reference semantics (``src/inverses.py:11-22``, golden-tested in
    ``tests/test_golden_losses.py``), with one documented deviation: for
    ``tanh`` the reference takes sqrt of a possibly-negative value (NaN
    that callers avoid by clamping upstream); we clamp to 0 instead.
    Note the reference's ``squared`` mode divides its min_step fill by
    sqrt(alpha) too (the whole array is scaled after the fill) — matched
    here."""
    _check(mode)
    if mode == "tanh":
        safe = jnp.sqrt(jnp.maximum(f, 0.0) / alpha)
        return jnp.where(f < 1.0 / alpha, safe, f)
    if mode == "squared":
        return jnp.where(
            f > 0, jnp.sqrt(jnp.maximum(f, 0.0)), min_step
        ) / jnp.sqrt(alpha)
    return jnp.where(f > 0, f, min_step)
