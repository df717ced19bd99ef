"""Re-measure the B=4 anomaly (twice) + B=16 via the windowed kernel."""
import sys
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
print("INIT_OK", jax.devices(), flush=True)
from tpu_spmv.bench.harness import bench_spmv
from tpu_spmv.bench import matrices as M
from tpu_spmv.formats.sell import RankedSlabs as RS
from tpu_spmv.kernels.spmm import spmm_ranked, spmm_ranked_windowed
from tpu_spmv.reorder.rcm import rcm as rcm_fn

mat = M.make("lap2d_1024")
work = mat.permuted(rcm_fn(mat.indptr, mat.indices))
lay = RS.from_csr(work)
rng = np.random.default_rng(3)
S = lay.num_subtiles
for tag, B, fn, l in (("B=4a", 4, spmm_ranked, lay), ("B=4b", 4, spmm_ranked, lay),
                      ("B=16w", 16, spmm_ranked_windowed, lay)):
    try:
        X = rng.standard_normal((mat.n, B)).astype(np.float32)
        Xj = jnp.asarray(X)
        Y = np.asarray(fn(l, Xj))
        ref = np.stack([work.matvec(X[:, b]) for b in range(B)], axis=1)
        rel = np.linalg.norm(Y - ref) / np.linalg.norm(ref)
        res = bench_spmv(fn, l, Xj, nnz=mat.nnz * B)
        print(f"{tag}: {res.time_min*1e6:.1f} us "
              f"{2*mat.nnz*B/res.time_min/1e9:.1f} GF/s "
              f"({res.time_min/S*1e9:.1f} ns/sub) rel={rel:.1e}", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
