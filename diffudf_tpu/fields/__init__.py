from .siren import SirenSpec, init_siren, siren_apply
from .transforms import gt_transform, gt_grad_norm, inverse_map

__all__ = [
    "SirenSpec",
    "init_siren",
    "siren_apply",
    "gt_transform",
    "gt_grad_norm",
    "inverse_map",
]
