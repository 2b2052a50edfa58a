"""Learning-rate schedule: warmup → stage-1 constant → stage-2 cosine decay.

Reference semantics (``train.py:167-191``):
  * epoch < warmup_epochs:            lr = warmup_lr
  * warmup_epochs ≤ epoch < s1_epochs: lr = lr_s1
  * epoch ≥ s1_epochs:                lr = lr_s2 · ½(1 + cos(π·t)),
    t = (epoch − s1_epochs)/(num_epochs − s1_epochs) ∈ [0, 1]

The stage-2 formula is the *intended* cosine decay: the reference computes
``cos(epoch/(epochs−s1)·π)`` with the absolute epoch (``train.py:186``), which
for the default 3000/2000 config runs the phase over [2π, 3π] and lands on the
same 1→0 half-cosine; we implement the explicit t∈[0,1] form with identical
endpoint values (see SURVEY §7 quirks).

``lr_for_epoch`` is traceable — epoch may be a device scalar, so the whole
schedule lives inside the compiled epoch scan.
"""

from __future__ import annotations

import jax.numpy as jnp


def lr_for_epoch(
    epoch,
    *,
    num_epochs: int,
    s1_epochs: int,
    warmup_epochs: int,
    warmup_lr: float,
    lr_s1: float,
    lr_s2: float,
):
    epoch = jnp.asarray(epoch, jnp.float32)
    base = jnp.where(epoch < warmup_epochs, warmup_lr, lr_s1)
    s2_span = max(num_epochs - s1_epochs, 1)
    t = jnp.clip((epoch - s1_epochs) / s2_span, 0.0, 1.0)
    cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * t)) * lr_s2
    return jnp.where(epoch >= s1_epochs, cosine, base)


def lr_for_epoch_siren(epoch, *, warmup_epochs: int, warmup_lr: float, lr: float):
    """Single-stage siren schedule (``train.py:44-54``)."""
    epoch = jnp.asarray(epoch, jnp.float32)
    return jnp.where(epoch < warmup_epochs, warmup_lr, lr)
