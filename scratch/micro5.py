"""tile_k sweep for the ranked kernel + STS solve timing."""
import sys, time

import numpy as np
import jax, jax.numpy as jnp
from scipy.sparse.csgraph import reverse_cuthill_mckee

from tpu_spmv.bench.matrices import laplacian_2d, random_banded
from tpu_spmv.formats.sell import RankedSlabs
from tpu_spmv.kernels.pallas_sell import spmv_ranked


def slope(fn, x, lo=50, hi=1050):
    def loop(reps):
        @jax.jit
        def run(xv):
            return jax.lax.fori_loop(0, reps, lambda i, v: fn(v) * 0.125 + v * 0.25, xv)
        return run
    flo, fhi = loop(lo), loop(hi)
    np.asarray(flo(x)); np.asarray(fhi(x))
    def t(f):
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter(); np.asarray(f(x)); best = min(best, time.perf_counter() - t0)
        return best
    return (t(fhi) - t(flo)) / (hi - lo)


mat = laplacian_2d(1024)
perm = np.asarray(reverse_cuthill_mckee(mat.to_scipy(), symmetric_mode=True))
mat = mat.permuted(perm)
x = jnp.asarray(np.random.default_rng(0).standard_normal(mat.n).astype(np.float32))

for tk in (256, 512, 1024, 2048):
    lay = RankedSlabs.from_csr(mat, tile_k=tk)
    ts = slope(lambda v, lay=lay: spmv_ranked(lay, v), x)
    print(f"tile_k={tk}: {ts*1e6:.0f}us {2*mat.nnz/ts/1e9:.1f} GF/s", file=sys.stderr)

# STS solve timing on a 131k-row banded system
from tpu_spmv.sts.host import build_sts, compute_b
from tpu_spmv.sts.solve import LowerSolveLayout, lower_solve

smat = random_banded(131072, 300, 10, seed=0)
sysm = build_sts(smat, order_type="LS")
b = compute_b(sysm.lower)
slay = LowerSolveLayout.build(sysm, b)
xs = np.asarray(lower_solve(slay))
wrong = int(np.sum(np.abs(xs - 1.0) > 0.01))
xd = jnp.zeros(smat.m, jnp.float32)


def solve_dep(v):
    out = lower_solve(slay, b_scale=slay.b_scale + v[0])
    return out


ts = slope(solve_dep, xd, lo=20, hi=220)
print(
    f"sts 131k (packs={sysm.num_packs}): wrong={wrong} t={ts*1e6:.0f}us "
    f"{2*sysm.lower.nnz/ts/1e9:.2f} GF/s",
    file=sys.stderr,
)
