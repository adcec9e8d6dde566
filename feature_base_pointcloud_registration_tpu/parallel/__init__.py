from .batch import (batch_register, batch_register_blocks,
                    batch_register_fast,
                    batch_register_fast_grid, batch_register_rounds,
                    build_map_block_tables,
                    build_map_grids, make_mesh,
                    shard_register)
from .map_sharded import make_2d_mesh, map_sharded_register

__all__ = [
    "batch_register",
    "batch_register_blocks",
    "build_map_block_tables",
    "batch_register_fast",
    "batch_register_fast_grid",
    "batch_register_rounds",
    "build_map_grids",
    "make_mesh",
    "shard_register",
    "make_2d_mesh",
    "map_sharded_register",
]
