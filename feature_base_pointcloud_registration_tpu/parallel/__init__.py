from .batch import batch_register, make_mesh, shard_register

__all__ = ["batch_register", "make_mesh", "shard_register"]
