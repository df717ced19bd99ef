"""On-chip layout shootout on the reference-class file matrices:
shipped ranked-binned vs packed-binned vs packed-aligned, f32 + bf16.
Usage: python scratch/r5_packed_files.py data/fem_1m.mtx
"""
import sys
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_spmv.bench.harness import bench_spmv
from tpu_spmv.formats.sell import RankedSlabs
from tpu_spmv.formats.packed import PackedRanked
from tpu_spmv.kernels.pallas_sell import spmv_ranked
from tpu_spmv.kernels.packed import spmv_packed
from tpu_spmv.reorder import rcm as rcm_fn
from tpu_spmv.tools.stats import load

path = sys.argv[1] if len(sys.argv) > 1 else "data/fem_1m.mtx"
mat = load(path)
perm = rcm_fn(mat.indptr, mat.indices)
work = mat.permuted(perm)
x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
xj = jnp.asarray(x[perm])
ref = work.matvec(np.asarray(xj))


def run(tag, lay, fn):
    y = np.asarray(fn(lay, xj))
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    res = bench_spmv(fn, lay, xj)
    S = lay.num_subtiles
    print(f"[{tag}] S={S} fill={lay.padding_ratio:.2f} rank_nb={lay.rank_nb} "
          f"G={max(lay.groups)+1 if lay.group_code else 'off'}: "
          f"{res.time_min*1e6:.1f} us  {2*mat.nnz/res.time_min/1e9:.1f} GF/s "
          f"({res.time_min/S*1e9:.1f} ns/sub)  rel={rel:.1e}", flush=True)


run("ranked-binW2 f32", RankedSlabs.from_csr(work, bin_blocks=2), spmv_ranked)
for W in (2, 4):
    try:
        run(f"packed-binW{W} f32",
            PackedRanked.from_csr(work, bin_blocks=W), spmv_packed)
    except ValueError as e:
        print(f"packed-binW{W}: {e}")
try:
    run("packed-aligned f32", PackedRanked.from_csr(work), spmv_packed)
except ValueError as e:
    print(f"packed-aligned: {e}")
try:
    run("packed-binW4 bf16",
        PackedRanked.from_csr(work, bin_blocks=4, val_dtype=jnp.bfloat16),
        spmv_packed)
except ValueError as e:
    print(f"packed-binW4 bf16: {e}")
