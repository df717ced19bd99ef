from tpu_spmv.dist.sharding import ShardedSell, spmv_sharded, make_row_mesh  # noqa: F401
from tpu_spmv.dist.solvers import cg_solve  # noqa: F401
