"""A/B: SpMM grid tile x loop shape on lap2d_1024 B=8 (chip).

r2 measured 194 GF/s, the r4 artifact 168.8 at tile 2048 (fori, over
the unroll budget at B=8), the shrink-to-1024 attempt 119. Decompose:
grid tile in {512,1024,2048} x {unrolled, fori}.
"""
import dataclasses
import numpy as np, jax.numpy as jnp
from tpu_spmv.bench.matrices import laplacian_2d
from tpu_spmv.bench.harness import bench_spmv
from tpu_spmv.formats.sell import RankedSlabs
from tpu_spmv.kernels import pallas_sell
from tpu_spmv.kernels import spmm as spmm_mod
from tpu_spmv.reorder import rcm

mat = laplacian_2d(1024)
mat = mat.permuted(rcm(mat.indptr, mat.indices))
B = 8
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((mat.n, B)).astype(np.float32))
lay = RankedSlabs.from_csr(mat)  # tile 2048, total_k 65536
assert int(lay.vals.shape[0]) % 2048 == 0

oracle = np.stack([mat.matvec(np.asarray(X[:, b])) for b in range(B)], 1)

for tile in (512, 1024, 2048):
    for budget in (10**9, 0):  # force unroll / force fori
        if tile == 2048 and budget == 10**9:
            continue  # 8192-step unrolled body: compile blowup, skip
        spmm_mod._B_AWARE_SHRINK = False
        pallas_sell._UNROLL_BUDGET = budget
        spmm_mod.spmm_ranked.clear_cache()
        l = dataclasses.replace(lay, tile_k=tile)
        Y = np.asarray(spmm_mod.spmm_ranked(l, X))
        rel = np.linalg.norm(Y - oracle) / np.linalg.norm(oracle)
        assert rel < 1e-6, (tile, budget, rel)
        res = bench_spmv(lambda l_, x_: spmm_mod.spmm_ranked(l_, x_), l, X,
                         nnz=mat.nnz)
        gf = 2 * mat.nnz * B / res.time_min / 1e9
        shape = "unroll" if budget else "fori"
        print(f"tile={tile} {shape:6s} -> {gf:.1f} GF/s "
              f"(t={res.time_min*1e6:.0f}us)", flush=True)
