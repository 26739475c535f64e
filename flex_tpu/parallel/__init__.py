from flex_tpu.parallel.mesh import make_mesh
from flex_tpu.parallel.spmm_sharded import ShardedEllPlan, prepare_ell_sharded
from flex_tpu.parallel.window_sharded import (
    ShardedWindowedPlan, prepare_windowed_sharded,
)

__all__ = [
    "make_mesh", "ShardedEllPlan", "prepare_ell_sharded",
    "ShardedWindowedPlan", "prepare_windowed_sharded",
]
