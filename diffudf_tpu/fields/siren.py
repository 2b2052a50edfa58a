"""SIREN coordinate MLP as a pure pytree of parameters.

Functional re-design of the reference's torch module (reference
``src/model.py:85-135``): no classes holding state, no autograd hooks — just an
immutable spec, an init function and a pure apply function.  This is the shape
JAX/XLA wants: the apply is a chain of (N, h) @ (h, h) matmuls that tile
directly onto the TPU MXU, params are replicated across the device mesh, and
the function composes freely with jit / vmap / shard_map and the fused
value-grad-Hessian propagation in :mod:`diffudf_tpu.autodiff.ops`.

Init distributions match the reference semantics (``src/model.py:7-19,111-113``):
  * first linear:   W ~ U(-1/fan_in, 1/fan_in)
  * hidden linears: W ~ U(-sqrt(6/fan_in)/ww, sqrt(6/fan_in)/ww)
  * final linear:   same as hidden (the reference applies ``sine_init`` to
    every module after the first, including the output head)
  * all biases:     U(-1/sqrt(fan_in), 1/sqrt(fan_in))  (torch Linear default,
    which the reference never overrides)

Activations: ``sin(w0·z)`` on the first layer, ``sin(ww·z)`` on hidden layers
(``relu(w·z)`` in relu mode); the output head is affine.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SirenSpec:
    """Static architecture description (hashable -> usable as a jit static arg)."""

    n_in: int = 3
    n_out: int = 1
    hidden: tuple = (256,) * 8
    w0: float = 30.0
    ww: float | None = None
    activation: str = "sine"  # 'sine' | 'relu'

    def __post_init__(self):
        object.__setattr__(self, "hidden", tuple(int(h) for h in self.hidden))
        if self.activation not in ("sine", "relu"):
            raise ValueError(f"unknown activation {self.activation!r}")

    @property
    def freqs(self) -> tuple:
        """Per-layer frequency multipliers (first layer w0, then ww)."""
        ww = self.w0 if self.ww is None else self.ww
        if self.activation == "relu":
            # the reference uses ww for every relu layer, including the first
            return (ww,) * len(self.hidden)
        return (self.w0,) + (ww,) * (len(self.hidden) - 1)

    @property
    def layer_dims(self) -> tuple:
        return (self.n_in,) + self.hidden + (self.n_out,)


def init_siren(key: jax.Array, spec: SirenSpec, dtype=jnp.float32):
    """Initialise parameters: a list of ``{'w': (in, out), 'b': (out,)}`` dicts."""
    ww = spec.w0 if spec.ww is None else spec.ww
    dims = spec.layer_dims
    params = []
    for i in range(len(dims) - 1):
        fan_in, fan_out = dims[i], dims[i + 1]
        key, wkey, bkey = jax.random.split(key, 3)
        if spec.activation == "sine":
            if i == 0:
                bound = 1.0 / fan_in
            else:
                bound = float(np.sqrt(6.0 / fan_in) / ww)
        else:
            bound = float(np.sqrt(6.0 / fan_in) / ww) if i else 1.0 / fan_in
        w = jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound)
        b_bound = 1.0 / float(np.sqrt(fan_in))
        b = jax.random.uniform(bkey, (fan_out,), dtype, -b_bound, b_bound)
        params.append({"w": w, "b": b})
    return params


def siren_apply(params, spec: SirenSpec, x: jax.Array) -> jax.Array:
    """Pure forward pass: ``(N, n_in) -> (N, n_out)``.

    Matches the reference forward (``src/model.py:116-135``) which returns the
    raw field value; gradient machinery lives in autodiff/, not here.
    """
    freqs = spec.freqs
    h = x
    for i, layer in enumerate(params[:-1]):
        z = h @ layer["w"] + layer["b"]
        if spec.activation == "sine":
            h = jnp.sin(freqs[i] * z)
        else:
            h = jax.nn.relu(freqs[i] * z)
    last = params[-1]
    return h @ last["w"] + last["b"]


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for leaf in params for p in leaf.values())
