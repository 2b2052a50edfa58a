from .lattice import lattice_points, extract_fields

__all__ = ["lattice_points", "extract_fields"]
