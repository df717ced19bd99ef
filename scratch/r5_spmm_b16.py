"""B=8 (resident) and B=16 (windowed) confirmation with the
positive-slope-filtered harness."""
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
for B, fn, tag in ((8, spmm_ranked, "B=8"), (16, spmm_ranked_windowed, "B=16w")):
    X = rng.standard_normal((mat.n, B)).astype(np.float32)
    Xj = jnp.asarray(X)
    Y = np.asarray(fn(lay, Xj))
    ref = np.stack([work.matvec(X[:, b]) for b in range(B)], axis=1)
    rel = np.linalg.norm(Y - ref) / np.linalg.norm(ref)
    ts = [bench_spmv(fn, lay, Xj, nnz=mat.nnz * B).time_min for _ in range(3)]
    t = min(ts)
    print(f"{tag}: {t*1e6:.1f} us (3 mins: {[round(x*1e6,1) for x in ts]}) "
          f"{2*mat.nnz*B/t/1e9:.1f} GF/s ({t/S*1e9:.2f} ns/sub) rel={rel:.1e}",
          flush=True)
