"""Experiment: paired window loads for the ranked kernel at rank_nb=2.

Loads each sublane's 2-block window as ONE (2,128) dynamic load, splits
by strided sublane slices, gathers twice, and combines with a single
select (sel in {0,1}).
"""
import sys, time
from functools import partial

import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from scipy.sparse.csgraph import reverse_cuthill_mckee

from tpu_spmv.bench.matrices import laplacian_2d
from tpu_spmv.formats.sell import LANES, SUBLANES, RankedSlabs
from tpu_spmv.kernels.pallas_sell import spmv_ranked, _round_up, _reduce_partials


def make_paired_kernel(tile_k):
    subs_per_tile = tile_k // SUBLANES

    def kernel(sub_b0, sub_dlo, sub_dhi, vals_ref, lcols_ref, x_ref, part_ref):
        t = pl.program_id(0)
        for s in range(subs_per_tile):
            g = t * subs_per_tile + s
            lcols = lcols_ref[s * SUBLANES : (s + 1) * SUBLANES, :].astype(jnp.int32)
            vals = vals_ref[s * SUBLANES : (s + 1) * SUBLANES, :]
            idx = jax.lax.bitwise_and(lcols, LANES - 1)
            sel = jax.lax.shift_right_logical(lcols, 7)
            b0 = sub_b0[g]
            dlo = sub_dlo[g]
            dhi = sub_dhi[g]
            bases = [
                b0 + jax.lax.bitwise_and(jax.lax.shift_right_logical(dlo, 8 * r), 255)
                for r in range(4)
            ] + [
                b0 + jax.lax.bitwise_and(jax.lax.shift_right_logical(dhi, 8 * r), 255)
                for r in range(4)
            ]
            wins = [x_ref[pl.ds(bases[r], 2), :] for r in range(SUBLANES)]
            xw0 = jnp.concatenate([w[0:1] for w in wins], axis=0)
            xw1 = jnp.concatenate([w[1:2] for w in wins], axis=0)
            g0 = jnp.take_along_axis(xw0, idx, axis=1, mode="promise_in_bounds")
            g1 = jnp.take_along_axis(xw1, idx, axis=1, mode="promise_in_bounds")
            acc = jnp.where(sel == 0, g0, g1)
            part_ref[s : s + 1, :] = jnp.sum(vals * acc, axis=0, keepdims=True)

    return kernel


@partial(jax.jit)
def spmv_paired(layout, x):
    assert layout.rank_nb == 2
    total_k = int(layout.vals.shape[0])
    tile_k = layout.tile_k or min(512, total_k)
    num_tiles = total_k // tile_k
    n_pad = _round_up(max(layout.n, LANES), LANES) + 2 * LANES
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
        make_paired_kernel(tile_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((layout.num_subtiles, LANES), jnp.float32),
    )(layout.sub_b0, layout.sub_dlo, layout.sub_dhi, layout.vals, layout.lcols, x2d)
    return _reduce_partials(partials, layout)


def slope(fn, lay, x, lo=50, hi=1050):
    def loop(reps):
        @jax.jit
        def run(xv):
            return jax.lax.fori_loop(0, reps, lambda i, v: fn(lay, v) * 0.125 + v * 0.25, xv)
        return run
    flo, fhi = loop(lo), loop(hi)
    np.asarray(flo(x)); np.asarray(fhi(x))
    def t(f):
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter(); np.asarray(f(x)); best = min(best, time.perf_counter() - t0)
        return best
    return (t(fhi) - t(flo)) / (hi - lo)


mat = laplacian_2d(1024)
perm = np.asarray(reverse_cuthill_mckee(mat.to_scipy(), symmetric_mode=True))
mat = mat.permuted(perm)
x = jnp.asarray(np.random.default_rng(0).standard_normal(mat.n).astype(np.float32))
lay = RankedSlabs.from_csr(mat)
yr = mat.matvec(np.asarray(x))
yp = np.asarray(spmv_paired(lay, x))
rel = np.linalg.norm(yp - yr) / np.linalg.norm(yr)
tp = slope(spmv_paired, lay, x)
tr = slope(spmv_ranked, lay, x)
print(f"paired: rel={rel:.1e} t={tp*1e6:.0f}us {2*mat.nnz/tp/1e9:.1f} GF/s | "
      f"ranked: t={tr*1e6:.0f}us {2*mat.nnz/tr/1e9:.1f} GF/s | "
      f"speedup {tr/tp:.2f}x", file=sys.stderr)
