#!/usr/bin/env python
"""Derive + validate the polynomial coefficients in diffudf_tpu/ops/sincos.py.

Chebyshev-node least-squares fit (near-minimax) of sin(x) = x·P(x²) and
cos(x) = Q(x²) over [-π, π], evaluated in float32 Horner form exactly as
the Pallas kernels do, plus the Cody-Waite 2π split and an end-to-end
accuracy sweep of the full fast_sincos reduction at increasing argument
scales.  Pure numpy — run with JAX_PLATFORMS=cpu or none at all.
"""

import numpy as np


def fit():
    x = np.cos(np.linspace(0, np.pi, 20001)) * np.pi  # chebyshev nodes
    x = x[np.abs(x) > 1e-9]
    u = x.astype(np.float64) ** 2

    # sin(x)/x as P(u), degree 6 (odd terms through x^13); weight by |x|
    # so the fit minimises the absolute error of sin itself
    A = np.stack([u**k for k in range(7)], axis=1)
    w = np.abs(x)
    coef_s, *_ = np.linalg.lstsq(A * w[:, None], np.sin(x) / x * w, rcond=None)

    # cos(x) as Q(u), degree 7 (even terms through x^14)
    B = np.stack([u**k for k in range(8)], axis=1)
    coef_c, *_ = np.linalg.lstsq(B, np.cos(x), rcond=None)
    return coef_s, coef_c


def horner32(c, u):
    acc = np.full_like(u, np.float32(c[-1]), np.float32)
    for k in range(len(c) - 2, -1, -1):
        acc = acc * u.astype(np.float32) + np.float32(c[k])
    return acc


def main():
    coef_s, coef_c = fit()
    print("sin coeffs:", [float(np.float32(v)) for v in coef_s])
    print("cos coeffs:", [float(np.float32(v)) for v in coef_c])

    xt = np.linspace(-np.pi, np.pi, 1000001)
    ut = (xt.astype(np.float32) ** 2).astype(np.float32)
    print(
        "poly-only max abs err: sin",
        np.abs(xt.astype(np.float32) * horner32(coef_s, ut) - np.sin(xt)).max(),
        " cos",
        np.abs(horner32(coef_c, ut) - np.cos(xt)).max(),
    )

    two_pi = 2 * np.pi
    hi = np.float32(6.28125)  # 201/32: 11 trailing zero mantissa bits
    mid = np.float32(two_pi - float(hi))
    lo = np.float32(two_pi - float(hi) - float(mid))
    print("2pi split:", float(hi), float(mid), float(lo),
          "resid:", two_pi - float(hi) - float(mid) - float(lo))

    inv = np.float32(1.0 / two_pi)

    def fast_sincos32(z):
        z = z.astype(np.float32)
        q = np.round(z * inv).astype(np.float32)
        r = ((z - q * hi) - q * mid) - q * lo
        u = r * r
        return r * horner32(coef_s, u), horner32(coef_c, u)

    # honest end-to-end error: vs float64 sin/cos of the SAME f32 argument
    for scale in (1.0, 10.0, 30.0, 100.0, 300.0):
        z = np.random.default_rng(0).uniform(-scale, scale, 2_000_000)
        z = z.astype(np.float32)
        z64 = z.astype(np.float64)
        s, c = fast_sincos32(z)
        print(
            f"scale {scale:6.1f}: max|s-sin| = {np.abs(s - np.sin(z64)).max():.3e}"
            f", max|c-cos| = {np.abs(c - np.cos(z64)).max():.3e}"
        )


if __name__ == "__main__":
    main()
