from .camera import pixel_rays, look_at_rotation, cube_entry_points
from .tracer import trace_rays, hit_attributes
from .shading import phong_shading, ward_reflectance

__all__ = [
    "pixel_rays",
    "look_at_rotation",
    "cube_entry_points",
    "trace_rays",
    "hit_attributes",
    "phong_shading",
    "ward_reflectance",
]
