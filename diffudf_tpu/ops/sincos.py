"""Shared-range-reduction sin/cos for the Pallas SIREN kernels.

The round-4 MFU study (``results/BENCH_mfu.json``) pinned the fused
training kernels at 55-65% of the measured matmul ceiling with the gap on
the VPU: every SIREN layer evaluates ``sin(w·z)`` AND ``cos(w·z)`` — two
independent transcendental calls per (tile, h) activation block
(the reference's torch path pays the same two CUDA transcendentals,
``src/model.py:25``, ``src/diff_operators.py:208-212``).

``sincos`` computes both from ONE Cody-Waite range reduction:

    q = round(z / 2π);   r = ((z − q·c_hi) − q·c_mid) − q·c_lo  ∈ [−π, π]
    sin z = r · P(r²)    (odd minimax-fit polynomial, 7 coefficients)
    cos z = Q(r²)        (even minimax-fit polynomial, 8 coefficients)

≈23 straight-line VPU mul/FMA ops for the PAIR — no table lookups, no
integer ops, no selects — versus two full transcendental expansions.

Accuracy (measured over uniform arguments, vs float64 of the same f32
input; see ``scripts/fit_sincos.py`` which derives the coefficients):

    |z| ≤ 1:    ≤ 8.5e-8 abs error (sin), ≤ 7.4e-8 (cos)
    |z| ≤ 300:  ≤ 6.3e-7 abs error — scale-independent (the reduction is
                exact for q ≤ ~2000: c_hi = 201/32 has 11 trailing zero
                mantissa bits, so q·c_hi is exact and the subtraction is
                same-binade)

i.e. ~5 ulps at unit magnitude — three orders of magnitude below the
accepted bf16-operand noise of the mixed-precision kernels (~4e-3) and
inside every golden tolerance.  SIREN pre-activations are |w·z| ≲ 100
(w0 = 30, |z| ≲ 3), far from the q-exactness bound.
"""

from __future__ import annotations

import jax.numpy as jnp

# 2π split for Cody-Waite reduction: c_hi = 201/32 exactly representable
# with 11 trailing zero mantissa bits (q·c_hi exact for q ≤ 2048);
# c_hi + c_mid + c_lo reproduces float64 2π to the last bit.
_TWO_PI_HI = 6.28125
_TWO_PI_MID = 0.0019353071
_TWO_PI_LO = 1.0253132e-11
_INV_TWO_PI = 0.15915494309189535

# Chebyshev-node least-squares fits on [-π, π] (scripts/fit_sincos.py):
# sin(x) = x·P(x²), max abs err 6.0e-7; cos(x) = Q(x²), max abs err 3.9e-7.
_SIN_COEF = (
    1.0, -0.16666664, 0.0083333105, -0.00019840153,
    2.7529395e-06, -2.4676488e-08, 1.3449976e-10,
)
_COS_COEF = (
    1.0, -0.5, 0.041666664, -0.0013888864,
    2.4800554e-05, -2.7534804e-07, 2.0603605e-09, -9.7225665e-12,
)


def _horner(coef, u):
    acc = jnp.float32(coef[-1])
    for c in coef[-2::-1]:
        acc = acc * u + jnp.float32(c)
    return acc


def fast_sincos(z):
    """(sin z, cos z) from one shared range reduction; z f32, any shape."""
    q = jnp.round(z * jnp.float32(_INV_TWO_PI))
    r = (
        (z - q * jnp.float32(_TWO_PI_HI))
        - q * jnp.float32(_TWO_PI_MID)
    ) - q * jnp.float32(_TWO_PI_LO)
    u = r * r
    return r * _horner(_SIN_COEF, u), _horner(_COS_COEF, u)


def fast_sin(z):
    """sin z alone (the sphere-trace value kernel needs no cos)."""
    q = jnp.round(z * jnp.float32(_INV_TWO_PI))
    r = (
        (z - q * jnp.float32(_TWO_PI_HI))
        - q * jnp.float32(_TWO_PI_MID)
    ) - q * jnp.float32(_TWO_PI_LO)
    return r * _horner(_SIN_COEF, r * r)


def sin(z, fast: bool = True):
    return fast_sin(z) if fast else jnp.sin(z)


def sincos(z, fast: bool = True):
    """(sin z, cos z); ``fast=False`` falls back to the two exact
    transcendentals (bit-identical to the XLA autodiff path — used by the
    strict kernel-identity tests and available as a parity switch)."""
    if fast:
        return fast_sincos(z)
    return jnp.sin(z), jnp.cos(z)
