"""U-sweep for the blocked _sub_loop on the over-budget SpMM shape."""
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
X = jnp.asarray(np.random.default_rng(0).standard_normal((mat.n, B)).astype(np.float32))
lay = RankedSlabs.from_csr(mat)
oracle = np.stack([mat.matvec(np.asarray(X[:, b])) for b in range(B)], 1)
spmm_mod._B_AWARE_SHRINK = False
l = dataclasses.replace(lay, tile_k=2048)

for cap in (8, 32):
    pallas_sell._BLK_CAP = cap
    spmm_mod.spmm_ranked.clear_cache()
    Y = np.asarray(spmm_mod.spmm_ranked(l, X))
    rel = np.linalg.norm(Y - oracle) / np.linalg.norm(oracle)
    assert rel < 1e-6, rel
    res = bench_spmv(lambda l_, x_: spmm_mod.spmm_ranked(l_, x_), l, X, nnz=mat.nnz)
    gf = 2 * mat.nnz * B / res.time_min / 1e9
    print(f"U<={cap}: {gf:.1f} GF/s (t={res.time_min*1e6:.0f}us)", flush=True)
