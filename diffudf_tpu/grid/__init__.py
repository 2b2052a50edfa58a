from .lattice import lattice_points, extract_fields, extract_fields_sparse

__all__ = ["lattice_points", "extract_fields", "extract_fields_sparse"]
