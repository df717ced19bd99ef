"""SpMM B-ladder, 3 repeats per point, resident kernel (B<=8) +
windowed (B=16): stable per-sub-tile costs for the floor fit."""
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
print(f"S={S} rank_nb={lay.rank_nb} tile_k={lay.tile_k}", flush=True)
for B in (1, 2, 4, 8, 16):
    fn = spmm_ranked if B <= 8 else spmm_ranked_windowed
    X = rng.standard_normal((mat.n, B)).astype(np.float32)
    Xj = jnp.asarray(X)
    Y = np.asarray(fn(lay, Xj))
    ref = np.stack([work.matvec(X[:, b]) for b in range(B)], axis=1)
    rel = np.linalg.norm(Y - ref) / np.linalg.norm(ref)
    ts = []
    for rep in range(3):
        res = bench_spmv(fn, lay, Xj, nnz=mat.nnz * B)
        ts.append(res.time_min)
    t = min(ts)
    spread = (max(ts) - t) / t * 100
    print(f"B={B}{'w' if B > 8 else ''}: {t*1e6:.1f} us (spread {spread:.0f}%) "
          f"{2*mat.nnz*B/t/1e9:.1f} GF/s ({t/S*1e9:.2f} ns/sub) rel={rel:.1e}",
          flush=True)
