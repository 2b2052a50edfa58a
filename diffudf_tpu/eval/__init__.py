from .chamfer import chamfer_distance, nearest_neighbor

__all__ = ["chamfer_distance", "nearest_neighbor"]
