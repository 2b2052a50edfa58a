from .mesh_io import load_mesh, save_mesh, load_point_cloud, save_point_cloud, Mesh, PointCloudData
from .normalize import normalize_mesh, normalize_point_cloud
from .sampling import sample_surface_points, TrainingSampler
from .mesh_distance import (
    point_cloud_distance,
    point_triangle_distance,
    winding_number,
    signed_mesh_distance,
)

__all__ = [
    "Mesh",
    "PointCloudData",
    "load_mesh",
    "save_mesh",
    "load_point_cloud",
    "save_point_cloud",
    "normalize_mesh",
    "normalize_point_cloud",
    "sample_surface_points",
    "TrainingSampler",
    "point_cloud_distance",
    "point_triangle_distance",
    "winding_number",
    "signed_mesh_distance",
]
