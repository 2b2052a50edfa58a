from .tet_mc import marching_tets_cells
from .table_mc import marching_cubes_cells
from .triangulate import triangulate_cells, TRIANGULATORS, DEFAULT_TRIANGULATOR
from .cap import extract_mesh_cap
from .sdf_mc import extract_mesh_signed
from .postprocess import clean_mesh, smooth_borders

__all__ = [
    "marching_tets_cells",
    "marching_cubes_cells",
    "triangulate_cells",
    "TRIANGULATORS",
    "DEFAULT_TRIANGULATOR",
    "extract_mesh_cap",
    "extract_mesh_signed",
    "clean_mesh",
    "smooth_borders",
]
