from osr_tpu.parallel.mesh import make_mesh, pick_mesh_shape
from osr_tpu.parallel.sharded import (
    ShardedDenseSearchEngine,
    ShardedHybridEngine,
    ShardedSparseSearchEngine,
)

__all__ = [
    "make_mesh",
    "pick_mesh_shape",
    "ShardedSparseSearchEngine",
    "ShardedDenseSearchEngine",
    "ShardedHybridEngine",
]
