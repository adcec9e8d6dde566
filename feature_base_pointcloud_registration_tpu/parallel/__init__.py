from .batch import (batch_register, batch_register_blocks,
                    batch_register_fast,
                    batch_register_fast_grid, batch_register_fused,
                    batch_register_rounds,
                    build_map_block_tables,
                    build_map_grids, build_map_planar_tables, make_mesh,
                    make_shard_register_tables, shard_register,
                    shard_register_tables)
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
    "batch_register_fused",
    "build_map_planar_tables",
    "shard_register",
    "make_shard_register_tables",
    "shard_register_tables",
    "make_2d_mesh",
    "map_sharded_register",
]
