"""Decompose flagship time: loop feedback vs kernel vs epilogue."""
import sys, time
from functools import partial

import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from scipy.sparse.csgraph import reverse_cuthill_mckee

from tpu_spmv.bench.matrices import laplacian_2d
from tpu_spmv.formats.sell import RankedSlabs, LANES, SUBLANES
from tpu_spmv.kernels.pallas_sell import (
    spmv_ranked, _make_ranked_kernel, _round_up,
)


def kernel_only(layout, x):
    """spmv_ranked minus the segment-sum epilogue (returns sliced partials)."""
    total_k = int(layout.vals.shape[0])
    tile_k = min(512, total_k)
    num_tiles = total_k // tile_k
    n_pad = _round_up(max(layout.n, LANES), LANES) + layout.rank_nb * LANES
    x2d = jnp.zeros((n_pad // LANES, LANES), jnp.float32)
    x2d = jax.lax.dynamic_update_slice(
        x2d.reshape(-1), x.astype(jnp.float32), (0,)
    ).reshape(n_pad // LANES, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_k, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_k // SUBLANES, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
        ),
    )
    partials = pl.pallas_call(
        _make_ranked_kernel(tile_k, layout.rank_nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((layout.num_subtiles, LANES), jnp.float32),
    )(layout.sub_b0, layout.sub_dlo, layout.sub_dhi, layout.vals, layout.lcols, x2d)
    return partials.reshape(-1)[: layout.m]


def slope(fn, lay, x, lo=50, hi=1050, samples=5):
    def loop(reps):
        @jax.jit
        def run(xv):
            def body(i, v):
                y = fn(lay, v) if lay is not None else v
                return y * 0.125 + v * 0.25
            return jax.lax.fori_loop(0, reps, body, xv)
        return run
    flo, fhi = loop(lo), loop(hi)
    np.asarray(flo(x)); np.asarray(fhi(x))
    tl = min(_t(flo, x) for _ in range(samples))
    th = min(_t(fhi, x) for _ in range(samples))
    return (th - tl) / (hi - lo)


def _t(f, x):
    t0 = time.perf_counter(); np.asarray(f(x)); return time.perf_counter() - t0


mat = laplacian_2d(1024)
perm = np.asarray(reverse_cuthill_mckee(mat.to_scipy(), symmetric_mode=True))
mat = mat.permuted(perm)
x = jnp.asarray(np.random.default_rng(0).standard_normal(mat.n).astype(np.float32))

ranked = RankedSlabs.from_csr(mat)
t_noop = slope(None, None, x)
t_kern = slope(kernel_only, ranked, x)
t_full = slope(spmv_ranked, ranked, x)
print(
    f"noop loop: {t_noop*1e6:.0f}us | kernel-only: {t_kern*1e6:.0f}us | "
    f"full: {t_full*1e6:.0f}us | epilogue: {(t_full-t_kern)*1e6:.0f}us",
    file=sys.stderr,
)
