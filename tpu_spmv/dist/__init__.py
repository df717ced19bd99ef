from tpu_spmv.dist.sharding import (  # noqa: F401
    ShardedRanked, ShardedSell, make_row_mesh, spmv_sharded,
)
from tpu_spmv.dist.solvers import cg_solve  # noqa: F401
