"""Ablate the ranked kernel's per-sub-tile cost components (v5e).

Calibration (general_50k W-sweep) says t/sub-tile = 13 + 3.7*pairs
cycles: the FIXED part dominates at the flagship's rank_nb=2. This
times kernel variants with parts removed to locate the 13 cycles.
Wrong math is fine; only timing matters.
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
from tpu_spmv.kernels.pallas_sell import _reduce_partials, _round_up


def make_kernel(tile_k, rank_nb, variant):
    subs_per_tile = tile_k // SUBLANES
    npairs = max((rank_nb + 1) // 2, 1)

    def kernel(sub_b0, sub_dlo, sub_dhi, vals_ref, lcols_ref, x_ref, part_ref):
        t = pl.program_id(0)
        for s in range(subs_per_tile):
            g = t * subs_per_tile + s
            vals = vals_ref[s * SUBLANES:(s + 1) * SUBLANES, :]
            if variant == "minimal":
                part_ref[s:s + 1, :] = vals[0:1, :] * 2.0
                continue
            lcols = lcols_ref[s * SUBLANES:(s + 1) * SUBLANES, :].astype(jnp.int32)
            idx = jax.lax.bitwise_and(lcols, LANES - 1)
            b0 = sub_b0[g]
            if variant == "nounpack":
                bases = [b0] * SUBLANES
            else:
                dlo = sub_dlo[g]
                dhi = sub_dhi[g]
                bases = [b0 + jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(dlo, 8 * r), 255) for r in range(4)
                ] + [b0 + jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(dhi, 8 * r), 255) for r in range(4)]
            sel = jax.lax.shift_right_logical(lcols, 7)
            acc = jnp.zeros((SUBLANES, LANES), jnp.float32)
            for p in range(npairs):
                if variant == "noloads":
                    wins = [x_ref[2 * p:2 * p + 2, :] for r in range(SUBLANES)]
                else:
                    wins = [x_ref[pl.ds(bases[r] + 2 * p, 2), :] for r in range(SUBLANES)]
                xw0 = jnp.concatenate([w[0:1] for w in wins], axis=0)
                xw1 = jnp.concatenate([w[1:2] for w in wins], axis=0)
                if variant == "nogather":
                    g0, g1 = xw0, xw1
                else:
                    g0 = jnp.take_along_axis(xw0, idx, axis=1, mode="promise_in_bounds")
                    g1 = jnp.take_along_axis(xw1, idx, axis=1, mode="promise_in_bounds")
                if rank_nb == 2:
                    acc = jnp.where(sel == 0, g0, g1)
                else:
                    acc = acc + jnp.where(sel == 2 * p, g0, 0.0) + jnp.where(sel == 2 * p + 1, g1, 0.0)
            if variant == "noreduce":
                part_ref[s:s + 1, :] = (vals * acc)[0:1, :]
            else:
                part_ref[s:s + 1, :] = jnp.sum(vals * acc, axis=0, keepdims=True)

    return kernel


@partial(jax.jit, static_argnames=("variant",))
def run(layout, x, variant):
    total_k = int(layout.vals.shape[0])
    tile_k = layout.tile_k or min(512, total_k)
    num_tiles = total_k // tile_k
    reads_nb = 2 * max((layout.rank_nb + 1) // 2, 1)
    n_pad = _round_up(max(layout.n, LANES), LANES) + reads_nb * LANES
    x2d = jnp.zeros((n_pad // LANES, LANES), jnp.float32)
    x2d = jax.lax.dynamic_update_slice(x2d.reshape(-1), x.astype(jnp.float32), (0,)).reshape(n_pad // LANES, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_k, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_k // SUBLANES, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
    )
    partials = pl.pallas_call(
        make_kernel(tile_k, layout.rank_nb, variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((layout.num_subtiles, LANES), jnp.float32),
    )(layout.sub_b0, layout.sub_dlo, layout.sub_dhi, layout.vals, layout.lcols, x2d)
    return _reduce_partials(partials, layout)


def slope(fn, x, lo=50, hi=1050):
    def loop(reps):
        @jax.jit
        def runl(xv):
            return jax.lax.fori_loop(0, reps, lambda i, v: fn(v) * 0.125 + v * 0.25, xv)
        return runl
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
lay = RankedSlabs.from_csr(mat)
x = jnp.asarray(np.random.default_rng(0).standard_normal(mat.n).astype(np.float32))
print(f"subtiles={lay.num_subtiles} rank_nb={lay.rank_nb} pad={lay.padding_ratio:.2f}", file=sys.stderr)

for variant in ("full", "nounpack", "nogather", "noloads", "noreduce", "minimal"):
    ts = slope(lambda v, variant=variant: run(lay, v, variant), x)
    cyc = ts * 940e6 / lay.num_subtiles
    print(f"{variant:10s}: {ts*1e6:7.1f}us  {cyc:5.1f} cyc/subtile  {2*mat.nnz/ts/1e9:6.1f} GF/s", file=sys.stderr)
