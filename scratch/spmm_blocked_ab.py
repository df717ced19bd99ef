"""Validate + measure the blocked-fori _sub_loop path on chip.

tile=2048 B=8 with the default budget and the B-aware shrink disabled:
subs*inner = 256*32 = 8192 > 6144 -> blocked fori with U=128 (2 outer
iterations). Compare to the bare-fori cliff (90 GF/s) and the
tile=1024 unrolled winner (306).
"""
import dataclasses
import numpy as np, jax.numpy as jnp
from tpu_spmv.bench.matrices import laplacian_2d
from tpu_spmv.bench.harness import bench_spmv
from tpu_spmv.formats.sell import RankedSlabs
from tpu_spmv.kernels import spmm as spmm_mod
from tpu_spmv.reorder import rcm

mat = laplacian_2d(1024)
mat = mat.permuted(rcm(mat.indptr, mat.indices))
B = 8
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((mat.n, B)).astype(np.float32))
lay = RankedSlabs.from_csr(mat)  # tile 2048
oracle = np.stack([mat.matvec(np.asarray(X[:, b])) for b in range(B)], 1)

spmm_mod._B_AWARE_SHRINK = False
l = dataclasses.replace(lay, tile_k=2048)
Y = np.asarray(spmm_mod.spmm_ranked(l, X))
rel = np.linalg.norm(Y - oracle) / np.linalg.norm(oracle)
assert rel < 1e-6, rel
res = bench_spmv(lambda l_, x_: spmm_mod.spmm_ranked(l_, x_), l, X,
                 nnz=mat.nnz)
gf = 2 * mat.nnz * B / res.time_min / 1e9
print(f"tile=2048 blocked-fori (U=128) -> {gf:.1f} GF/s "
      f"(t={res.time_min*1e6:.0f}us) rel={rel:.1e}", flush=True)
