from .ops import value, value_grad, value_grad_hessian, value_grad_hessian_ad
from .eigh3 import eigh3x3, top_eigenvector
from .curvature import mean_curvature, gaussian_curvature, principal_curvatures

__all__ = [
    "value",
    "value_grad",
    "value_grad_hessian",
    "value_grad_hessian_ad",
    "eigh3x3",
    "top_eigenvector",
    "mean_curvature",
    "gaussian_curvature",
    "principal_curvatures",
]
