"""Microbench: where does the SELL kernel's time go?

Sweeps max_nb (gather loop trips) and tile_k on a synthetic layout with
controlled window width, prints per-config slope times.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpu_spmv.bench.harness import bench_spmv
from tpu_spmv.bench.matrices import laplacian_2d, random_banded
from tpu_spmv.formats.sell import SellSlabs
from tpu_spmv.kernels.pallas_sell import spmv_sell
from tpu_spmv.reorder.rcm import rcm


def main():
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    mat = laplacian_2d(1024)
    perm = np.asarray(reverse_cuthill_mckee(mat.to_scipy(), symmetric_mode=True))
    mat = mat.permuted(perm)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(mat.n).astype(np.float32))

    layout = SellSlabs.from_csr(mat)
    print(f"m={mat.m} nnz={mat.nnz} pad={layout.padding_ratio:.2f} "
          f"max_nb={layout.max_nb} subtiles={layout.num_subtiles}", file=sys.stderr)
    # Histogram of sub_nb
    nb = np.asarray(layout.sub_nb)
    print("sub_nb histogram:", np.bincount(nb), file=sys.stderr)

    # 1) effect of max_nb (force larger loop to measure per-iteration cost)
    for forced_nb in (layout.max_nb, layout.max_nb + 2, layout.max_nb + 6):
        lo = SellSlabs(**{**layout.__dict__, "max_nb": forced_nb})
        r = bench_spmv(spmv_sell, lo, x)
        print(f"max_nb={forced_nb}: {r.gflops:.1f} GFLOP/s t={r.time_min*1e6:.0f}us",
              file=sys.stderr)


if __name__ == "__main__":
    main()
