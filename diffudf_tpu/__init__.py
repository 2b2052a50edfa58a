"""diffudf_tpu — a TPU-native framework for Differentiable Unsigned Distance Fields.

A ground-up JAX/XLA/Pallas re-design of the capabilities of LIA-DiTella/DiffUDF
(CVPR 2024, "DUDF: Differentiable Unsigned Distance Fields with Hyperbolic
Scaling"): fit a SIREN coordinate MLP to the hyperbolically-scaled unsigned
distance field f(x) = d(x)·tanh(α·d(x)) of a 3D shape, then extract geometry by
marching cubes (CAP / voted-UDF), sphere-traced rendering with curvature
shading, dense point-cloud projection, and 2D level-set slices.

Design (TPU-first, not a port):
  * All hot paths are jit-compiled, statically shaped, and expressed as large
    batched matmuls that tile onto the MXU (fields/, autodiff/, ops/).
  * f, ∇f and H(f) are computed in ONE fused forward pass by analytic
    Taylor-mode propagation through the MLP (autodiff/ops.py) instead of the
    reference's 4 sequential reverse-mode passes.
  * Per-point 3×3 eigendecompositions use a closed-form trigonometric solver
    (autodiff/eigh3.py) instead of batched LAPACK calls.
  * Training, grid extraction, sphere tracing and point-cloud projection run
    entirely on device; scaling across chips is data-parallel sharding over a
    jax.sharding.Mesh with XLA collectives (parallel/).
  * The one inherently-sequential component — voted-sign BFS for UDF marching
    cubes (MeshUDF-style) — is a native C++ module (native/).
"""

__version__ = "0.1.0"
