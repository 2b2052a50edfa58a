from .mesh import data_mesh, shard_batch, replicate, batch_spec

__all__ = ["data_mesh", "shard_batch", "replicate", "batch_spec"]
