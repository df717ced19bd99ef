"""Measured dense-GEMV baseline datum (VERDICT r4 missing #3):
dense vs ranked vs segsum on cap-sized matrices, real chip."""
import sys
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
print("INIT_OK", jax.devices(), flush=True)
from tpu_spmv.bench.harness import bench_spmv
from tpu_spmv.bench.matrices import random_banded, random_general
from tpu_spmv.formats.sell import RankedSlabs
from tpu_spmv.kernels.dense import DenseLayout, spmv_dense
from tpu_spmv.kernels.pallas_sell import spmv_ranked
from tpu_spmv.kernels.segsum import SegsumLayout, spmv_segsum
from tpu_spmv.reorder.rcm import rcm as rcm_fn

for name, mat in (
    ("banded_8k (w=200, 12/row)", random_banded(8000, 200, 12, seed=0)),
    ("general_8k (8/row)", random_general(8000, 8, seed=1)),
):
    work = mat.permuted(rcm_fn(mat.indptr, mat.indices))
    x = np.random.default_rng(2).standard_normal(mat.n).astype(np.float32)
    xj = jnp.asarray(x)
    ref = work.matvec(x)
    dens = mat.nnz / (mat.m * mat.n)
    print(f"== {name} nnz={mat.nnz} density={dens:.2%} ==", flush=True)
    for tag, lay, fn in (
        ("dense ", DenseLayout.from_csr(work), spmv_dense),
        ("ranked", RankedSlabs.from_csr(work), spmv_ranked),
        ("segsum", SegsumLayout.from_csr(work), spmv_segsum),
    ):
        y = np.asarray(fn(lay, xj))
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        res = bench_spmv(fn, lay, xj)
        print(f"  [{tag}] {res.time_min*1e6:8.1f} us  "
              f"{2*mat.nnz/res.time_min/1e9:7.2f} GF/s  rel={rel:.1e}",
              flush=True)
