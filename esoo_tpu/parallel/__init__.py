from .sharded import (
    make_orbital_mesh,
    make_orbital_state_mesh,
    shard_problem_tensors,
    shard_sector_tables,
    sharded_rotated_energy,
    sharded_bb_step,
    ShardedOrbitalOptimizer,
)

__all__ = [
    "make_orbital_mesh",
    "make_orbital_state_mesh",
    "shard_problem_tensors",
    "shard_sector_tables",
    "sharded_rotated_energy",
    "sharded_bb_step",
    "ShardedOrbitalOptimizer",
]
