"""road_2m on-chip: ranked-aligned vs binned W=2 vs packed, f32/bf16,
plus epilogue share and the planner's auto choice under r4b calib."""
import sys
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_spmv.bench.harness import bench_spmv
from tpu_spmv.formats.sell import RankedSlabs
from tpu_spmv.formats.packed import PackedRanked
from tpu_spmv.kernels.pallas_sell import spmv_ranked, _reduce_partials
from tpu_spmv.kernels.packed import spmv_packed
from tpu_spmv.reorder import rcm as rcm_fn
from tpu_spmv.tools.stats import load

path = sys.argv[1] if len(sys.argv) > 1 else "data/road_2m.mtx"
mat = load(path)
perm = rcm_fn(mat.indptr, mat.indices)
work = mat.permuted(perm)
x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
xj = jnp.asarray(x[perm])
ref = work.matvec(np.asarray(xj))

from tpu_spmv.tune.model import tpu_plan
plan = tpu_plan(work, assume_rcm=True)
print(f"plan: {plan.kernel} bin={plan.bin_blocks} sigma={plan.sigma} cost={plan.est_cost:.0f} ({plan.reason})")

def run(tag, lay, fn):
    y = np.asarray(fn(lay, xj))
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    res = bench_spmv(fn, lay, xj)
    S = lay.num_subtiles
    print(f"[{tag}] S={S} fill={lay.padding_ratio:.2f} rank_nb={lay.rank_nb} "
          f"G={max(lay.groups)+1 if lay.group_code else 'off'}: "
          f"{res.time_min*1e6:.1f} us  {2*mat.nnz/res.time_min/1e9:.1f} GF/s "
          f"({res.time_min/S*1e9:.1f} ns/sub)  rel={rel:.1e}")
    return res.time_min

run("ranked-aligned f32", RankedSlabs.from_csr(work), spmv_ranked)
run("ranked-binW2 f32", RankedSlabs.from_csr(work, bin_blocks=2), spmv_ranked)
run("packed f32", PackedRanked.from_csr(work), spmv_packed)
run("packed bf16", PackedRanked.from_csr(work, val_dtype=jnp.bfloat16), spmv_packed)

lay = RankedSlabs.from_csr(work)
S = lay.num_subtiles
P = jnp.asarray(np.random.default_rng(1).standard_normal((S, 128)), jnp.float32)
def epi(layout, xv):
    return _reduce_partials(P + xv[0] * 1e-20, layout)
res_e = bench_spmv(epi, lay, xj, nnz=mat.nnz)
print(f"epilogue(segment-sum, S={S}): {res_e.time_min*1e6:.1f} us")
