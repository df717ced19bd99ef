"""On-chip decomposition of the fem_1m W=2 binned row: kernel vs
segment-sum epilogue, f32 vs bf16 values. Run with the tunnel up."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_spmv.bench.harness import bench_spmv
from tpu_spmv.formats.sell import RankedSlabs
from tpu_spmv.kernels.pallas_sell import spmv_ranked, _reduce_partials
from tpu_spmv.reorder import rcm as rcm_fn
from tpu_spmv.tools.stats import load

path = sys.argv[1] if len(sys.argv) > 1 else "data/fem_1m.mtx"
W = int(sys.argv[2]) if len(sys.argv) > 2 else 2
mat = load(path)
perm = rcm_fn(mat.indptr, mat.indices)
work = mat.permuted(perm)
x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
xj = jnp.asarray(x[perm])

for vdt in (None, jnp.bfloat16):
    lay = RankedSlabs.from_csr(work, bin_blocks=W, val_dtype=vdt)
    tag = "bf16" if vdt else "f32"
    S = lay.num_subtiles
    print(f"[{tag}] W={W} S={S} fill={lay.padding_ratio:.2f} rank_nb={lay.rank_nb} "
          f"G={max(lay.groups)+1 if lay.group_code else 'off'} tile_k={lay.tile_k} "
          f"chunk_q={lay.chunk_q} slab_mb={(lay.vals.size*lay.vals.dtype.itemsize + lay.lcols.size*lay.lcols.dtype.itemsize)/2**20:.0f}")
    y = np.asarray(spmv_ranked(lay, xj))
    ref = work.matvec(np.asarray(xj))
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    print(f"  rel_l2 vs permuted oracle: {rel:.2e}")

    res = bench_spmv(spmv_ranked, lay, xj)
    t_full = res.time_min
    print(f"  full: {t_full*1e6:.1f} us  {2*mat.nnz/t_full/1e9:.1f} GF/s  ({t_full/S*1e9:.1f} ns/subtile)")

    # Epilogue alone: partials fixed, chained via the rectangular fold.
    P = jnp.asarray(np.random.default_rng(1).standard_normal((S, 128)), jnp.float32)

    def epi(layout, xv):
        # fold xv into partials so the chain is data-dependent
        return _reduce_partials(P + xv[0] * 1e-20, layout)

    res_e = bench_spmv(epi, lay, xj, nnz=mat.nnz)
    print(f"  epilogue(segment-sum): {res_e.time_min*1e6:.1f} us")
