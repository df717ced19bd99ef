"""r5 chip batch 2: scattered-class best configs + sigma engagement,
SpMM B-sweep decomposition, and the weak-scaling compute anchor.
Usage: python scratch/r5_chip_batch2.py [scattered|spmm|anchor|all]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

print("INIT_OK", jax.devices(), flush=True)

from tpu_spmv.bench import matrices as M
from tpu_spmv.bench.harness import bench_spmv
from tpu_spmv.formats.packed import PackedRanked
from tpu_spmv.formats.sell import RankedSlabs, sigma_sort
from tpu_spmv.kernels.packed import spmv_packed
from tpu_spmv.kernels.pallas_sell import spmv_ranked
from tpu_spmv.reorder import rcm as rcm_fn

which = sys.argv[1] if len(sys.argv) > 1 else "all"


def bench(tag, nnz, lay, fn, xj, ref):
    y = np.asarray(fn(lay, xj))
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    res = bench_spmv(fn, lay, xj)
    S = lay.num_subtiles
    print(f"[{tag}] S={S} fill={lay.padding_ratio:.2f} rank={lay.rank_nb}: "
          f"{res.time_min*1e6:.1f} us  {2*nnz/res.time_min/1e9:.2f} GF/s  "
          f"({res.time_min/S*1e9:.1f} ns/sub)  rel={rel:.1e}", flush=True)


if which in ("scattered", "all"):
    for name in ("powerlaw_1m", "general_500k"):
        mat = M.make(name)
        work = mat.permuted(rcm_fn(mat.indptr, mat.indices))
        srt, sperm = sigma_sort(work, 4096)
        x = np.random.default_rng(0).standard_normal(mat.n).astype(
            np.float32
        )
        print(f"== {name} nnz={mat.nnz} ==", flush=True)
        for tag, mm, rperm in (
            ("rcm", work, None),
            ("rcm+sigma4096", srt, sperm),
        ):
            xj = jnp.asarray(x[rcm_fn(mat.indptr, mat.indices)])
            ref = mm.matvec(np.asarray(xj))
            Ws = (2, 16) if name == "powerlaw_1m" else (16, 32)
            for W in Ws:
                try:
                    lay = PackedRanked.from_csr(mm, bin_blocks=W)
                    bench(f"{tag} pk-W{W}", mat.nnz, lay, spmv_packed,
                          xj, ref)
                except ValueError as e:
                    print(f"{tag} pk-W{W}: {e}", flush=True)
                    lay = RankedSlabs.from_csr(mm, bin_blocks=W)
                    bench(f"{tag} rk-W{W}", mat.nnz, lay, spmv_ranked,
                          xj, ref)

if which in ("spmm", "all"):
    # SpMM B-sweep on the flagship class: t(B) decomposes per-sub-tile
    # cost into fixed (slab/window loads) + per-column (gather+fma)
    # terms — the floor analysis VERDICT r4 weak #7 asks for.
    from tpu_spmv.formats.sell import RankedSlabs as RS
    from tpu_spmv.kernels.spmm import spmm_ranked

    mat = M.make("lap2d_1024")
    work = mat.permuted(rcm_fn(mat.indptr, mat.indices))
    lay = RS.from_csr(work)
    rng = np.random.default_rng(3)
    S = lay.num_subtiles
    for B in (1, 2, 4, 8, 16):
        X = rng.standard_normal((mat.n, B)).astype(np.float32)
        Xj = jnp.asarray(X)
        Y = np.asarray(spmm_ranked(lay, Xj))
        ref = np.stack([work.matvec(X[:, b]) for b in range(B)], axis=1)
        rel = np.linalg.norm(Y - ref) / np.linalg.norm(ref)
        res = bench_spmv(spmm_ranked, lay, Xj, nnz=mat.nnz * B)
        print(f"B={B}: {res.time_min*1e6:.1f} us "
              f"{2*mat.nnz*B/res.time_min/1e9:.1f} GF/s "
              f"({res.time_min/S*1e9:.1f} ns/sub) rel={rel:.1e}",
              flush=True)

if which in ("anchor", "all"):
    # Weak-scaling compute anchor: per-shard kernel time vs shard size
    # on ONE chip. The scaling model's t_comp = local_nnz /
    # single_chip_nnzs (hw.py: 48e9 for v5e); measure nnz/s on shard-
    # sized banded problems to bound the model's compute-term error.
    from tpu_spmv.hw import device_spec

    print(f"model single_chip_nnzs = {device_spec().single_chip_nnzs:.3g}",
          flush=True)
    for m in (262_144, 1_048_576, 4_194_304):
        mat = M.random_banded(m, 64, 8, seed=0)
        work = mat.permuted(rcm_fn(mat.indptr, mat.indices))
        lay = PackedRanked.from_csr(work)
        x = np.random.default_rng(1).standard_normal(m).astype(np.float32)
        xj = jnp.asarray(x)
        ref = work.matvec(x)
        bench(f"anchor m={m}", mat.nnz, lay, spmv_packed, xj, ref)
