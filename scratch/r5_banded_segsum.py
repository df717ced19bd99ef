import sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
print("INIT_OK", jax.devices(), flush=True)
from tpu_spmv.bench.matrices import random_banded
from tpu_spmv.kernels.segsum import SegsumLayout, spmv_segsum
from tpu_spmv.reorder.rcm import rcm as rcm_fn

mat = random_banded(1_000_000, 1000, 16, seed=1)
mat = mat.permuted(rcm_fn(mat.indptr, mat.indices))
print("built", mat.nnz, flush=True)
lay = SegsumLayout.from_csr(mat)
print("layout host ok", flush=True)
x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
y = np.asarray(spmv_segsum(lay, jnp.asarray(x)))
rel = np.linalg.norm(y - mat.matvec(x)) / np.linalg.norm(mat.matvec(x))
print("rel", rel, flush=True)
