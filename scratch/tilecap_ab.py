"""A/B: ranked/packed grid-tile cap 2048 (default) vs 8192 on the
bench suite (chip). r4 measured banded_1m +4% at an opt-in 8192 tile;
the SpMM B-aware shrink + blocked fori have since removed the unroll
hazard that kept 8192 opt-in. Decides whether to raise the default.
"""
import numpy as np, jax.numpy as jnp
from tpu_spmv.bench.harness import bench_spmv
from tpu_spmv.bench.matrices import (
    laplacian_2d, random_banded, random_general, variable_stencil,
)
from tpu_spmv.formats.sell import RankedSlabs
from tpu_spmv.formats.packed import PackedRanked
from tpu_spmv.kernels.pallas_sell import spmv_ranked
from tpu_spmv.kernels.packed import spmv_packed
from tpu_spmv.reorder import rcm

CASES = [
    ("lap2d_1024", lambda: laplacian_2d(1024), 0),
    ("varstencil_1024", lambda: variable_stencil(1024), 0),
    ("banded_1m", lambda: random_banded(1_000_000, 6000, 12, seed=0), 2),
    ("general_500k", lambda: random_general(500_000, 9, seed=0), 16),
]

for name, make, bb in CASES:
    mat = make()
    mat = mat.permuted(rcm(mat.indptr, mat.indices))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
    )
    oracle = mat.matvec(np.asarray(x))
    for cap in (2048, 8192):
        lay = RankedSlabs.from_csr(mat, tile_k=cap, bin_blocks=bb)
        y = np.asarray(spmv_ranked(lay, x))
        rel = np.linalg.norm(y - oracle) / np.linalg.norm(oracle)
        assert rel < 1e-6, (name, cap, rel)
        r = bench_spmv(spmv_ranked, lay, x)
        print(f"{name} ranked cap={cap} tile={lay.tile_k} "
              f"-> {r.gflops:.1f} GF/s", flush=True)
    if bb == 0:
        for cap in (2048, 8192):
            pk = PackedRanked.from_csr(mat, tile_k=cap)
            y = np.asarray(spmv_packed(pk, x))
            rel = np.linalg.norm(y - oracle) / np.linalg.norm(oracle)
            assert rel < 1e-6, (name, cap, rel)
            r = bench_spmv(spmv_packed, pk, x)
            print(f"{name} packed cap={cap} tile={pk.tile_k} "
                  f"-> {r.gflops:.1f} GF/s", flush=True)
