from .tet_mc import marching_tets_cells
from .cap import extract_mesh_cap
from .sdf_mc import extract_mesh_signed
from .postprocess import clean_mesh, smooth_borders

__all__ = [
    "marching_tets_cells",
    "extract_mesh_cap",
    "extract_mesh_signed",
    "clean_mesh",
    "smooth_borders",
]
