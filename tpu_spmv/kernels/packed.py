"""Pallas SpMV over the packed mixed-height layout (formats/packed.py).

Same per-sublane rank-windowed gather as spmv_ranked
(kernels/pallas_sell.py), with the sub-tile epilogue replaced by a
3-way static segmented reduce and a carry register:

  part[2s]   = emit? carry + sum(prod, sublanes <  b1) : 0
  part[2s+1] =              sum(prod, b1 <= sublane < b2)
  carry'     = emit? sum(prod, sublanes >= b2) : carry + sum(prod)

The carry persists across grid steps in a (1, 128) VMEM scratch
(Mosaic's grid is sequential), zeroed at t == 0. All stores are static
(rows 2s, 2s+1) — the dynamic-store chunk flush that killed the r2
quantum-2 attempt (docs/PERF_NOTES.md) is structurally absent. The
host-side epilogue is a row gather: each chunk's total lands in exactly
one statically known partial row (layout.out_row).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_spmv.formats.packed import PackedRanked
from tpu_spmv.formats.sell import LANES, SUBLANES
from tpu_spmv.kernels.pallas_sell import _meta_block, _pad_meta, _round_up


def _make_packed_kernel(tile_k: int, rank_nb: int, loop: bool = False):
    # loop: run the sub-tile loop as lax.fori_loop instead of unrolling —
    # set in interpret mode, where the unrolled body blows up the plain
    # HLO the CPU backend compiles (see pallas_sell._sub_loop).
    subs_per_tile = tile_k // SUBLANES
    npairs = max((rank_nb + 1) // 2, 1)
    tiles_per_block, _ = _meta_block(subs_per_tile)

    def kernel(
        sub_b0, sub_dlo, sub_dhi, bmeta,
        vals_ref, lcols_ref, x_ref, part_ref, carry_ref,
    ):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            carry_ref[...] = jnp.zeros((1, LANES), jnp.float32)

        off = jax.lax.rem(t, tiles_per_block) * subs_per_tile
        kvec = jax.lax.broadcasted_iota(
            jnp.int32, (SUBLANES, LANES), 0
        )
        carry = carry_ref[...]

        def step(s, carry):
            lcols = lcols_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.int32
            )
            vals = vals_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.float32
            )
            idx = jax.lax.bitwise_and(lcols, LANES - 1)
            b0 = sub_b0[off + s]
            dlo = sub_dlo[off + s]
            dhi = sub_dhi[off + s]
            bases = [
                b0 + jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(dlo, 8 * r), 255
                )
                for r in range(4)
            ] + [
                b0 + jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(dhi, 8 * r), 255
                )
                for r in range(4)
            ]
            if rank_nb == 1:
                xw = jnp.concatenate(
                    [x_ref[pl.ds(bases[r], 1), :] for r in range(SUBLANES)],
                    axis=0,
                )
                acc = jnp.take_along_axis(
                    xw, idx, axis=1, mode="promise_in_bounds"
                )
            else:
                sel = jax.lax.shift_right_logical(lcols, 7)
                acc = jnp.zeros((SUBLANES, LANES), jnp.float32)
                for p in range(npairs):
                    wins = [
                        x_ref[pl.ds(bases[r] + 2 * p, 2), :]
                        for r in range(SUBLANES)
                    ]
                    xw0 = jnp.concatenate([w[0:1] for w in wins], axis=0)
                    xw1 = jnp.concatenate([w[1:2] for w in wins], axis=0)
                    g0 = jnp.take_along_axis(
                        xw0, idx, axis=1, mode="promise_in_bounds"
                    )
                    g1 = jnp.take_along_axis(
                        xw1, idx, axis=1, mode="promise_in_bounds"
                    )
                    if rank_nb == 2:
                        acc = jnp.where(sel == 0, g0, g1)
                    else:
                        acc = (
                            acc
                            + jnp.where(sel == 2 * p, g0, 0.0)
                            + jnp.where(sel == 2 * p + 1, g1, 0.0)
                        )
            prod = vals * acc

            meta = bmeta[off + s]
            b1 = jax.lax.bitwise_and(meta, 15)
            b2 = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(meta, 4), 15
            )
            emit = jax.lax.shift_right_logical(meta, 8) >= 1
            sA = jnp.sum(
                jnp.where(kvec < b1, prod, 0.0), axis=0, keepdims=True
            )
            sAB = jnp.sum(
                jnp.where(kvec < b2, prod, 0.0), axis=0, keepdims=True
            )
            tot = jnp.sum(prod, axis=0, keepdims=True)
            part_ref[pl.ds(2 * s, 1), :] = jnp.where(emit, carry + sA, 0.0)
            part_ref[pl.ds(2 * s + 1, 1), :] = sAB - sA
            return jnp.where(emit, tot - sAB, carry + tot)

        if loop:
            carry = jax.lax.fori_loop(0, subs_per_tile, step, carry)
        else:
            for s in range(subs_per_tile):
                carry = step(s, carry)

        carry_ref[...] = carry

    return kernel


def _make_packed_grouped_kernel(tile_k: int, rank_nb: int, groups: tuple,
                                loop: bool = False):
    """Grouped-window packed kernel: G absolute bases per sub-tile from
    SMEM (one load per group per pair-step — the 15-28% win over the
    8-load packed-delta unpack, see _make_grouped_kernel) combined with
    the mixed-height segmented epilogue of _make_packed_kernel.

    NOTE: the gather loop and the segmented-reduce/carry epilogue are
    deliberate per-variant specializations of _make_packed_kernel's
    (Mosaic codegen is sensitive to indirection here); any fix to the
    bmeta decode, emit condition, carry handoff, or sel/pair gather
    MUST be mirrored in _make_packed_kernel AND the two spmm_packed
    variants (kernels/spmm.py _make_spmm_packed_kernel). The fuzz
    suite (tests/test_fuzz_kernels.py) runs all of them on the same
    matrices and catches one-sided edits."""
    subs_per_tile = tile_k // SUBLANES
    G = max(groups) + 1
    npairs = max((rank_nb + 1) // 2, 1)
    tiles_per_block, _ = _meta_block(subs_per_tile)
    tpb_g, _ = _meta_block(subs_per_tile * G)

    def kernel(
        grp_b0, bmeta, vals_ref, lcols_ref, x_ref, part_ref, carry_ref,
    ):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            carry_ref[...] = jnp.zeros((1, LANES), jnp.float32)

        goff = jax.lax.rem(t, tpb_g) * (subs_per_tile * G)
        moff = jax.lax.rem(t, tiles_per_block) * subs_per_tile
        kvec = jax.lax.broadcasted_iota(
            jnp.int32, (SUBLANES, LANES), 0
        )
        carry = carry_ref[...]

        def step(s, carry):
            lcols = lcols_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.int32
            )
            vals = vals_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.float32
            )
            idx = jax.lax.bitwise_and(lcols, LANES - 1)
            bases = [grp_b0[goff + s * G + gi] for gi in range(G)]
            if rank_nb == 1:
                wins = [x_ref[pl.ds(bases[gi], 1), :] for gi in range(G)]
                xw = jnp.concatenate(
                    [wins[groups[r]] for r in range(SUBLANES)], axis=0
                )
                acc = jnp.take_along_axis(
                    xw, idx, axis=1, mode="promise_in_bounds"
                )
            else:
                sel = jax.lax.shift_right_logical(lcols, 7)
                acc = jnp.zeros((SUBLANES, LANES), jnp.float32)
                for p in range(npairs):
                    wins = [
                        x_ref[pl.ds(bases[gi] + 2 * p, 2), :]
                        for gi in range(G)
                    ]
                    xw0 = jnp.concatenate(
                        [wins[groups[r]][0:1] for r in range(SUBLANES)],
                        axis=0,
                    )
                    xw1 = jnp.concatenate(
                        [wins[groups[r]][1:2] for r in range(SUBLANES)],
                        axis=0,
                    )
                    g0 = jnp.take_along_axis(
                        xw0, idx, axis=1, mode="promise_in_bounds"
                    )
                    g1 = jnp.take_along_axis(
                        xw1, idx, axis=1, mode="promise_in_bounds"
                    )
                    if rank_nb == 2:
                        acc = jnp.where(sel == 0, g0, g1)
                    else:
                        acc = (
                            acc
                            + jnp.where(sel == 2 * p, g0, 0.0)
                            + jnp.where(sel == 2 * p + 1, g1, 0.0)
                        )
            prod = vals * acc

            meta = bmeta[moff + s]
            b1 = jax.lax.bitwise_and(meta, 15)
            b2 = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(meta, 4), 15
            )
            emit = jax.lax.shift_right_logical(meta, 8) >= 1
            sA = jnp.sum(
                jnp.where(kvec < b1, prod, 0.0), axis=0, keepdims=True
            )
            sAB = jnp.sum(
                jnp.where(kvec < b2, prod, 0.0), axis=0, keepdims=True
            )
            tot = jnp.sum(prod, axis=0, keepdims=True)
            part_ref[pl.ds(2 * s, 1), :] = jnp.where(emit, carry + sA, 0.0)
            part_ref[pl.ds(2 * s + 1, 1), :] = sAB - sA
            return jnp.where(emit, tot - sAB, carry + tot)

        if loop:
            carry = jax.lax.fori_loop(0, subs_per_tile, step, carry)
        else:
            for s in range(subs_per_tile):
                carry = step(s, carry)

        carry_ref[...] = carry

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def spmv_packed(
    layout: PackedRanked, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """y = A @ x with A in packed mixed-height rank-windowed layout."""
    total_k = int(layout.vals.shape[0])
    tile_k = layout.tile_k
    num_tiles = total_k // tile_k
    subs_per_tile = tile_k // SUBLANES

    reads_nb = 2 * max((layout.rank_nb + 1) // 2, 1)
    n_pad = _round_up(max(layout.n, LANES), LANES) + reads_nb * LANES
    x2d = jnp.zeros((n_pad // LANES, LANES), jnp.float32)
    x2d = jax.lax.dynamic_update_slice(
        x2d.reshape(-1), x.astype(jnp.float32), (0,)
    ).reshape(n_pad // LANES, LANES)

    tpb, block_elems = _meta_block(subs_per_tile)
    smem1d = pl.BlockSpec(
        (block_elems,), lambda t: (t // tpb,), memory_space=pltpu.SMEM
    )
    if layout.group_code:
        G = max(layout.groups) + 1
        kernel = _make_packed_grouped_kernel(
            tile_k, layout.rank_nb, layout.groups, loop=interpret
        )
        tpb_g, block_elems_g = _meta_block(subs_per_tile * G)
        smem_g = pl.BlockSpec(
            (block_elems_g,), lambda t: (t // tpb_g,),
            memory_space=pltpu.SMEM,
        )
        meta_specs = [smem_g, smem1d]
        meta = (
            _pad_meta(layout.grp_b0, num_tiles, subs_per_tile * G, tpb_g),
            _pad_meta(layout.bmeta, num_tiles, subs_per_tile, tpb),
        )
    else:
        kernel = _make_packed_kernel(tile_k, layout.rank_nb, loop=interpret)
        meta_specs = [smem1d] * 4
        meta = tuple(
            _pad_meta(a, num_tiles, subs_per_tile, tpb)
            for a in (
                layout.sub_b0, layout.sub_dlo, layout.sub_dhi, layout.bmeta
            )
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_tiles,),
        in_specs=meta_specs + [
            pl.BlockSpec(
                (tile_k, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_k, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x, fully resident
        ],
        out_specs=pl.BlockSpec(
            (2 * subs_per_tile, LANES), lambda t: (t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.float32)],
    )

    partials = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (2 * layout.num_subtiles, LANES), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * layout.padded_nnz,
            bytes_accessed=layout.hbm_bytes,
            transcendentals=0,
        ),
    )(*meta, layout.vals, layout.lcols, x2d)

    # Each chunk's total is in exactly one statically known partial row.
    y = jnp.take(partials, layout.out_row, axis=0)
    return y.reshape(-1)[: layout.m]
