"""TPU A/B: plain SELL kernel vs rank-windowed kernel."""
import sys

import numpy as np
import jax.numpy as jnp

from tpu_spmv.bench.harness import bench_spmv
from tpu_spmv.bench.matrices import laplacian_2d, random_banded
from tpu_spmv.formats.sell import RankedSlabs, SellSlabs
from tpu_spmv.kernels.pallas_sell import spmv_ranked, spmv_sell


def run(name, mat):
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    perm = np.asarray(reverse_cuthill_mckee(mat.to_scipy(), symmetric_mode=True))
    mat = mat.permuted(perm)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
    )
    y_ref = mat.matvec(np.asarray(x))

    plain = SellSlabs.from_csr(mat)
    ranked = RankedSlabs.from_csr(mat)
    yp = np.asarray(spmv_sell(plain, x))
    yr = np.asarray(spmv_ranked(ranked, x))
    rp = np.linalg.norm(yp - y_ref) / np.linalg.norm(y_ref)
    rr = np.linalg.norm(yr - y_ref) / np.linalg.norm(y_ref)
    bp = bench_spmv(spmv_sell, plain, x)
    br = bench_spmv(spmv_ranked, ranked, x)
    print(
        f"{name}: plain {bp.gflops:.1f} GF/s (nb={plain.max_nb}, rel={rp:.1e}) | "
        f"ranked {br.gflops:.1f} GF/s (nb={ranked.rank_nb}, rel={rr:.1e}) | "
        f"speedup {bp.time_min / br.time_min:.2f}x",
        file=sys.stderr,
    )


run("lap2d_1024", laplacian_2d(1024))
run("banded_500k", random_banded(500_000, 800, 16, seed=1))
