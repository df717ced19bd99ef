"""Minimal general_500k binned-ranked measurement for r2->r3 bisect.

Uses only APIs stable across r2..HEAD: random_general, rcm, RankedSlabs
.from_csr(mat, bin_blocks=16), spmv_ranked, bench_spmv. Run from the
worktree root: PYTHONPATH=$PWD:/root/.axon_site python scratch/bisect_g500k.py
"""
import numpy as np
import jax.numpy as jnp

from tpu_spmv.bench.harness import bench_spmv, validate
from tpu_spmv.bench.matrices import random_general
from tpu_spmv.formats.sell import RankedSlabs
from tpu_spmv.kernels.pallas_sell import spmv_ranked
from tpu_spmv.reorder import rcm

mat = random_general(500_000, 10, seed=2)
mat = mat.permuted(rcm(mat.indptr, mat.indices))
x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
xj = jnp.asarray(x)
lay = RankedSlabs.from_csr(mat, bin_blocks=16)
y = np.asarray(spmv_ranked(lay, xj))
wrong, rel = validate(y, mat.matvec(x))
r = bench_spmv(spmv_ranked, lay, xj)
print(
    f"BISECT general_500k ranked W=16: {r.gflops:.3f} GF/s "
    f"tmin={r.time_min:.4e} wrong={wrong} pad={lay.padding_ratio:.3f} "
    f"rank_nb={lay.rank_nb} tile_k={lay.tile_k}",
    flush=True,
)
