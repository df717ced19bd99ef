"""Focused flagship timing: fixed large reps, one compile per kernel."""
import sys, time

import numpy as np
import jax, jax.numpy as jnp

from tpu_spmv.bench.matrices import laplacian_2d
from tpu_spmv.formats.sell import RankedSlabs, SellSlabs
from tpu_spmv.kernels.pallas_sell import spmv_ranked, spmv_sell
from scipy.sparse.csgraph import reverse_cuthill_mckee


def slope(fn, lay, x, lo=50, hi=1050):
    def loop(reps):
        @jax.jit
        def run(xv):
            def body(i, v):
                return fn(lay, v) * 0.125 + v * 0.25
            return jax.lax.fori_loop(0, reps, body, xv)
        return run

    flo, fhi = loop(lo), loop(hi)
    np.asarray(flo(x)); np.asarray(fhi(x))
    tl = min(_t(flo, x) for _ in range(5))
    th = min(_t(fhi, x) for _ in range(5))
    return (th - tl) / (hi - lo)


def _t(f, x):
    t0 = time.perf_counter(); np.asarray(f(x)); return time.perf_counter() - t0


mat = laplacian_2d(1024)
perm = np.asarray(reverse_cuthill_mckee(mat.to_scipy(), symmetric_mode=True))
mat = mat.permuted(perm)
x = jnp.asarray(np.random.default_rng(0).standard_normal(mat.n).astype(np.float32))
gf = lambda t: 2 * mat.nnz / t / 1e9

plain = SellSlabs.from_csr(mat)
tp = slope(spmv_sell, plain, x)
ranked = RankedSlabs.from_csr(mat)
tr = slope(spmv_ranked, ranked, x)
print(f"plain nb={plain.max_nb}: {tp*1e6:.0f}us {gf(tp):.1f} GF/s | "
      f"ranked nb={ranked.rank_nb}: {tr*1e6:.0f}us {gf(tr):.1f} GF/s | "
      f"speedup {tp/tr:.2f}x", file=sys.stderr)
