"""Experiment: quantum-2 slab heights + in-kernel chunk flush.

Slab heights quantized to 2 sublanes (pad 1.6 -> ~1.2 on the 5-point
Laplacian); the kernel accumulates pair-group sums across sub-tiles and
writes finalized chunks into a VMEM-resident y (no partials array, no
epilogue). Compare against spmv_ranked.
"""
import sys, time

import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from scipy.sparse.csgraph import reverse_cuthill_mckee

from tpu_spmv.bench.matrices import laplacian_2d
from tpu_spmv.formats.sell import (
    LANES, SUBLANES, RankedSlabs, _aligned_slots, _round_up,
)
from tpu_spmv.kernels.pallas_sell import spmv_ranked

Q = 2  # sublanes per flush group


def build_q2(mat, tile_k=512):
    m, n = mat.shape
    num_chunks = max(_round_up(m, LANES) // LANES, 1)
    rows = np.repeat(np.arange(m, dtype=np.int64), mat.row_lengths)
    ranks, kc_raw = _aligned_slots(mat)
    kc = np.maximum(_round_up_arr(kc_raw, Q), Q)
    koff = np.zeros(num_chunks + 1, dtype=np.int64)
    np.cumsum(kc, out=koff[1:])
    total_k = _round_up(int(koff[-1]), tile_k)
    vals = np.zeros((total_k, LANES), dtype=np.float32)
    cols = np.full((total_k, LANES), -1, dtype=np.int64)
    dest_k = koff[rows // LANES] + ranks
    dest_l = rows % LANES
    vals[dest_k, dest_l] = mat.data
    cols[dest_k, dest_l] = mat.indices

    S = total_k // SUBLANES
    units = cols >> 7
    real = vals != 0.0
    big = np.where(real, units, np.iinfo(np.int32).max).reshape(S, SUBLANES, LANES)
    sub_base = big.min(axis=2)
    empty = sub_base == np.iinfo(np.int32).max
    tile_min = sub_base.min(axis=1)
    tile_min[tile_min == np.iinfo(np.int32).max] = 0
    sub_base = np.where(empty, tile_min[:, None], sub_base)
    base_cols = np.repeat(sub_base.reshape(-1), LANES).reshape(total_k, LANES)
    lcols = np.where(real, cols - (base_cols << 7), 0)
    rank_nb = (int(lcols.max()) >> 7) + 1
    lcols = lcols.astype(np.int16)

    sub_b0 = sub_base.min(axis=1)
    deltas = (sub_base - sub_b0[:, None]).astype(np.uint32)
    assert deltas.max() <= 255
    dlo = np.zeros(S, dtype=np.uint32)
    dhi = np.zeros(S, dtype=np.uint32)
    for r in range(4):
        dlo |= deltas[:, r] << (8 * r)
        dhi |= deltas[:, r + 4] << (8 * r)

    G = total_k // Q
    gstart = np.arange(G, dtype=np.int64) * Q
    group_chunk = np.searchsorted(koff, gstart, side="right") - 1
    group_chunk = np.minimum(group_chunk, num_chunks)  # pad tail -> sentinel
    keep = np.ones(G, dtype=np.int64)
    keep[0] = 0
    keep[1:] = (group_chunk[1:] == group_chunk[:-1]).astype(np.int64)

    as32 = lambda a: jnp.asarray(a.astype(np.int64).astype(np.int32))
    pad_ratio = total_k * LANES / mat.nnz
    print(f"q2 layout: pad={pad_ratio:.2f} rank_nb={rank_nb} S={S}", file=sys.stderr)
    return dict(
        vals=jnp.asarray(vals), lcols=jnp.asarray(lcols),
        sub_b0=as32(sub_b0), dlo=as32(dlo.view(np.int32)), dhi=as32(dhi.view(np.int32)),
        gchunk=as32(group_chunk), gkeep=as32(keep),
        m=m, n=n, nnz=mat.nnz, num_chunks=num_chunks,
        rank_nb=rank_nb, total_k=total_k, tile_k=tile_k,
    )


def _round_up_arr(a, mult):
    return -(-a // mult) * mult


def make_flush_kernel(tile_k, rank_nb, num_chunks):
    subs_per_tile = tile_k // SUBLANES
    gper_sub = SUBLANES // Q

    def kernel(sub_b0, dlo_a, dhi_a, gchunk, gkeep,
               vals_ref, lcols_ref, x_ref, y_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for s in range(subs_per_tile):
            g = t * subs_per_tile + s
            lcols = lcols_ref[s * SUBLANES : (s + 1) * SUBLANES, :].astype(jnp.int32)
            vals = vals_ref[s * SUBLANES : (s + 1) * SUBLANES, :]
            idx = jax.lax.bitwise_and(lcols, LANES - 1)
            sel = jax.lax.shift_right_logical(lcols, 7)
            b0 = sub_b0[g]
            dlo = dlo_a[g]
            dhi = dhi_a[g]
            bases = [
                b0 + jax.lax.bitwise_and(jax.lax.shift_right_logical(dlo, 8 * r), 255)
                for r in range(4)
            ] + [
                b0 + jax.lax.bitwise_and(jax.lax.shift_right_logical(dhi, 8 * r), 255)
                for r in range(4)
            ]
            acc = jnp.zeros((SUBLANES, LANES), jnp.float32)
            for i in range(rank_nb):
                xw = jnp.concatenate(
                    [x_ref[pl.ds(bases[r] + i, 1), :] for r in range(SUBLANES)],
                    axis=0,
                )
                gathered = jnp.take_along_axis(xw, idx, axis=1, mode="promise_in_bounds")
                acc = acc + jnp.where(sel == i, gathered, 0.0)
            prod = vals * acc
            for p in range(gper_sub):
                gg = g * gper_sub + p
                pair = jnp.sum(prod[p * Q : (p + 1) * Q], axis=0, keepdims=True)
                keep = gkeep[gg].astype(jnp.float32)
                acc_ref[:] = acc_ref[:] * keep + pair
                y_ref[pl.ds(gchunk[gg], 1), :] = acc_ref[:]

    return kernel


def spmv_flush(lay, x):
    tile_k = lay["tile_k"]
    num_tiles = lay["total_k"] // tile_k
    rank_nb = lay["rank_nb"]
    n_pad = _round_up(max(lay["n"], LANES), LANES) + rank_nb * LANES
    x2d = jnp.zeros((n_pad // LANES, LANES), jnp.float32)
    x2d = jax.lax.dynamic_update_slice(
        x2d.reshape(-1), x.astype(jnp.float32), (0,)
    ).reshape(n_pad // LANES, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_k, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.float32)],
    )
    y = pl.pallas_call(
        make_flush_kernel(tile_k, rank_nb, lay["num_chunks"]),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((lay["num_chunks"] + 1, LANES), jnp.float32),
    )(
        lay["sub_b0"], lay["dlo"], lay["dhi"], lay["gchunk"], lay["gkeep"],
        lay["vals"], lay["lcols"], x2d,
    )
    return y[:-1].reshape(-1)[: lay["m"]]


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
yr = mat.matvec(np.asarray(x))

lay2 = build_q2(mat)
y2 = np.asarray(spmv_flush(lay2, x))
rel2 = np.linalg.norm(y2 - yr) / np.linalg.norm(yr)
t2 = slope(lambda v: spmv_flush(lay2, v), x)

ranked = RankedSlabs.from_csr(mat)
tr = slope(lambda v: spmv_ranked(ranked, v), x)
print(
    f"flush q2: rel={rel2:.1e} t={t2*1e6:.0f}us {2*mat.nnz/t2/1e9:.1f} GF/s | "
    f"ranked: t={tr*1e6:.0f}us {2*mat.nnz/tr/1e9:.1f} GF/s",
    file=sys.stderr,
)
