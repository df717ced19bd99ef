"""Multi-vector SpMV (SpMM): Y = A @ X over the rank-windowed layout.

Serving deployments apply one matrix to batches of vectors; the
reference has no SpMM (single-vector drivers only), so this extends the
kernel family. The economics differ from B independent SpMVs:

  * slab traffic (the HBM bound) is paid ONCE for all B columns,
  * each sublane's paired x window loads as one (2B, 128) dynamic copy
    covering every column (X is staged block-major, column-minor), so
    the dominant load count stays 8 per sub-tile pair-step,
  * per column: 2 gathers + select + multiply-reduce on data already in
    registers.

Reuses RankedSlabs unchanged; B is a static kernel parameter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_spmv.formats.sell import LANES, SUBLANES, RankedSlabs
from tpu_spmv.kernels.pallas_sell import _round_up


# Gate for the B-aware grid-tile shrink in spmm_ranked (A/B scripts
# disable it, with spmm_ranked.clear_cache(), to pin the tile).
_B_AWARE_SHRINK = True


def _make_spmm_kernel(tile_k: int, rank_nb: int, B: int, loop: bool = False):
    subs_per_tile = tile_k // SUBLANES
    npairs = max((rank_nb + 1) // 2, 1)

    from tpu_spmv.kernels.pallas_sell import _meta_block, _sub_loop

    tiles_per_block, _ = _meta_block(subs_per_tile)

    def kernel(sub_b0, sub_dlo, sub_dhi, vals_ref, lcols_ref, x_ref, part_ref):
        off = jax.lax.rem(
            pl.program_id(0), tiles_per_block
        ) * subs_per_tile

        def body(s):
            lcols = lcols_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.int32
            )
            vals = vals_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.float32
            )
            idx = jax.lax.bitwise_and(lcols, LANES - 1)
            sel = jax.lax.shift_right_logical(lcols, 7)
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
            accs = [jnp.zeros((SUBLANES, LANES), jnp.float32)] * B
            for p in range(npairs):
                # One (2B,128) load per sublane covers both window blocks
                # of the pair-step for every column: rows [0,B) = block
                # 2p, rows [B,2B) = block 2p+1, column-minor.
                wins = [
                    x_ref[pl.ds((bases[r] + 2 * p) * B, 2 * B), :]
                    for r in range(SUBLANES)
                ]
                for b in range(B):
                    xw0 = jnp.concatenate(
                        [w[b : b + 1] for w in wins], axis=0
                    )
                    xw1 = jnp.concatenate(
                        [w[B + b : B + b + 1] for w in wins], axis=0
                    )
                    g0 = jnp.take_along_axis(
                        xw0, idx, axis=1, mode="promise_in_bounds"
                    )
                    g1 = jnp.take_along_axis(
                        xw1, idx, axis=1, mode="promise_in_bounds"
                    )
                    if rank_nb == 2:
                        accs[b] = jnp.where(sel == 0, g0, g1)
                    else:
                        accs[b] = (
                            accs[b]
                            + jnp.where(sel == 2 * p, g0, 0.0)
                            + jnp.where(sel == 2 * p + 1, g1, 0.0)
                        )
            part = jnp.concatenate(
                [
                    jnp.sum(vals * accs[b], axis=0, keepdims=True)
                    for b in range(B)
                ],
                axis=0,
            )
            part_ref[pl.ds(s * B, B), :] = part

        _sub_loop(subs_per_tile, 2 * npairs * B, body, force_loop=loop)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def spmm_ranked(
    layout: RankedSlabs, X: jax.Array, interpret: bool = False
) -> jax.Array:
    """Y = A @ X with X (n, B) float32 -> Y (m, B). B is static."""
    n, B = X.shape
    total_k = int(layout.vals.shape[0])
    tile_k = layout.tile_k or min(512, total_k)
    # B-aware grid tile: the layout's tile was sized for the SpMV
    # kernel (inner = 2*npairs); SpMM's per-sub-tile step count scales
    # with B, so the r4 padded-up 2048-sublane tiles at B=8 would
    # spill _sub_loop into lax.fori_loop (~50 cyc/iteration — measured
    # 169 vs 194 GF/s on the flagship). The resident kernel carries no
    # per-tile metadata, so shrink to the largest divisor of total_k
    # whose fully-unrolled kernel fits the budget.
    from tpu_spmv.kernels.pallas_sell import _UNROLL_BUDGET

    npairs = max((layout.rank_nb + 1) // 2, 1)
    inner = 2 * npairs * B
    while (
        _B_AWARE_SHRINK
        and tile_k > 512
        and (tile_k // SUBLANES) * inner > _UNROLL_BUDGET
        and total_k % (tile_k // 2) == 0
    ):
        tile_k //= 2
    num_tiles = total_k // tile_k

    reads_nb = 2 * max((layout.rank_nb + 1) // 2, 1)
    n_pad = _round_up(max(layout.n, LANES), LANES) + reads_nb * LANES
    nblocks = n_pad // LANES
    # Stage X block-major, column-minor: row block*B + b holds
    # X[block*128 : block*128+128, b].
    Xp = jnp.zeros((nblocks * LANES, B), jnp.float32)
    Xp = jax.lax.dynamic_update_slice(Xp, X.astype(jnp.float32), (0, 0))
    x2d = (
        Xp.reshape(nblocks, LANES, B)
        .transpose(0, 2, 1)
        .reshape(nblocks * B, LANES)
    )

    subs_per_tile = tile_k // SUBLANES
    # Tile-blocked SMEM metadata (see pallas_sell._make_ranked_kernel).
    from tpu_spmv.kernels.pallas_sell import _meta_block, _pad_meta

    tpb, block_elems = _meta_block(subs_per_tile)
    smem1d = pl.BlockSpec(
        (block_elems,), lambda t: (t // tpb,), memory_space=pltpu.SMEM
    )
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            smem1d, smem1d, smem1d,
            pl.BlockSpec(
                (tile_k, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_k, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # staged X, resident
        ],
        out_specs=pl.BlockSpec(
            (subs_per_tile * B, LANES), lambda t: (t, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    partials = pl.pallas_call(
        _make_spmm_kernel(tile_k, layout.rank_nb, B, loop=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (layout.num_subtiles * B, LANES), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * layout.padded_nnz * B,
            bytes_accessed=layout.hbm_bytes + 4 * (n + layout.m) * B,
            transcendentals=0,
        ),
    )(_pad_meta(layout.sub_b0, num_tiles, subs_per_tile, tpb),
      _pad_meta(layout.sub_dlo, num_tiles, subs_per_tile, tpb),
      _pad_meta(layout.sub_dhi, num_tiles, subs_per_tile, tpb),
      layout.vals, layout.lcols, x2d)

    nc = layout.num_chunks
    q = layout.chunk_q
    if q:
        y = (
            partials[: nc * q * B]
            .reshape(nc, q, B, LANES)
            .sum(axis=1)
        )
    else:
        seg = jnp.repeat(layout.sub_chunk, B) * B + jnp.tile(
            jnp.arange(B, dtype=layout.sub_chunk.dtype),
            layout.num_subtiles,
        )
        # seg is NOT sorted when a chunk owns >1 sub-tile (ids cycle
        # c*B..c*B+B-1 per sub-tile) — the sorted hint would be UB.
        sums = jax.ops.segment_sum(
            partials, seg, num_segments=(nc + 1) * B, indices_are_sorted=False
        )
        y = sums[: nc * B].reshape(nc, B, LANES)
    # (nc, B, 128) -> (nc*128, B) row-major.
    return y.transpose(0, 2, 1).reshape(nc * LANES, B)[: layout.m]


def _make_spmm_windowed_kernel(
    tile_k: int, rank_nb: int, B: int, win_w: int, num_tiles: int,
    loop: bool = False,
):
    """HBM-windowed SpMM: X stays in HBM (staged block-major, column-
    minor as in spmm_ranked); each grid step DMAs its tile's window —
    win_w x-blocks = win_w*B staged rows — into a double-buffered VMEM
    scratch while the previous step computes. Removes the VMEM residency
    cap on n*B (the resident kernel stages all of X in VMEM)."""
    subs_per_tile = tile_k // SUBLANES
    npairs = max((rank_nb + 1) // 2, 1)

    from tpu_spmv.kernels.pallas_sell import _meta_block, _sub_loop

    tiles_per_block, _ = _meta_block(subs_per_tile)

    def kernel(
        tile_b0, sub_b0, sub_dlo, sub_dhi,
        vals_ref, lcols_ref, x_hbm, part_ref, xwin, sems,
    ):
        t = pl.program_id(0)
        moff = jax.lax.rem(t, tiles_per_block) * subs_per_tile
        slot = jax.lax.rem(t, 2)
        nslot = jax.lax.rem(t + 1, 2)

        def win_dma(which_slot, which_tile):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(tile_b0[which_tile] * B, win_w * B), :],
                xwin.at[which_slot],
                sems.at[which_slot],
            )

        @pl.when(t == 0)
        def _():
            win_dma(0, 0).start()

        @pl.when(t + 1 < num_tiles)
        def _():
            win_dma(nslot, t + 1).start()

        win_dma(slot, t).wait()
        w0 = tile_b0[t]

        def body(s):
            lcols = lcols_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.int32
            )
            vals = vals_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.float32
            )
            idx = jax.lax.bitwise_and(lcols, LANES - 1)
            sel = jax.lax.shift_right_logical(lcols, 7)
            b0 = sub_b0[moff + s] - w0
            dlo = sub_dlo[moff + s]
            dhi = sub_dhi[moff + s]
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
            accs = [jnp.zeros((SUBLANES, LANES), jnp.float32)] * B
            for p in range(npairs):
                wins = [
                    xwin[slot, pl.ds((bases[r] + 2 * p) * B, 2 * B), :]
                    for r in range(SUBLANES)
                ]
                for b in range(B):
                    xw0 = jnp.concatenate(
                        [w[b : b + 1] for w in wins], axis=0
                    )
                    xw1 = jnp.concatenate(
                        [w[B + b : B + b + 1] for w in wins], axis=0
                    )
                    g0 = jnp.take_along_axis(
                        xw0, idx, axis=1, mode="promise_in_bounds"
                    )
                    g1 = jnp.take_along_axis(
                        xw1, idx, axis=1, mode="promise_in_bounds"
                    )
                    if rank_nb == 2:
                        accs[b] = jnp.where(sel == 0, g0, g1)
                    else:
                        accs[b] = (
                            accs[b]
                            + jnp.where(sel == 2 * p, g0, 0.0)
                            + jnp.where(sel == 2 * p + 1, g1, 0.0)
                        )
            part = jnp.concatenate(
                [
                    jnp.sum(vals * accs[b], axis=0, keepdims=True)
                    for b in range(B)
                ],
                axis=0,
            )
            part_ref[pl.ds(s * B, B), :] = part

        _sub_loop(subs_per_tile, 2 * npairs * B, body, force_loop=loop)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def spmm_ranked_windowed(
    layout: RankedSlabs, X: jax.Array, interpret: bool = False
) -> jax.Array:
    """Y = A @ X with X streamed from HBM in per-tile windows.

    Same results as spmm_ranked; choose this when the staged X (n*B
    floats) does not fit the VMEM budget. Requires a layout built with
    per-tile windows (win_w > 0, as for spmv_ranked_windowed). VMEM use
    is O(tile_k + win_w*B), not O(n*B)."""
    n, B = X.shape
    total_k = int(layout.vals.shape[0])
    tile_k = layout.tile_k
    num_tiles = total_k // tile_k
    win_w = layout.win_w
    if win_w <= 0:
        raise ValueError(
            "layout has no per-tile windows (win_w == 0); rebuild via "
            "RankedSlabs.from_csr before using the windowed kernel"
        )

    # Guard blocks: every window DMA reads win_w blocks from its base.
    nblocks = _round_up(max(layout.n, LANES), LANES) // LANES + win_w
    Xp = jnp.zeros((nblocks * LANES, B), jnp.float32)
    Xp = jax.lax.dynamic_update_slice(Xp, X.astype(jnp.float32), (0, 0))
    x2d = (
        Xp.reshape(nblocks, LANES, B)
        .transpose(0, 2, 1)
        .reshape(nblocks * B, LANES)
    )

    subs_per_tile = tile_k // SUBLANES
    from tpu_spmv.kernels.pallas_sell import _meta_block, _pad_meta

    tpb, block_elems = _meta_block(subs_per_tile)
    smem1d = pl.BlockSpec(
        (block_elems,), lambda t, *_: (t // tpb,), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            smem1d, smem1d, smem1d,
            pl.BlockSpec(
                (tile_k, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_k, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # staged X, HBM-resident
        ],
        out_specs=pl.BlockSpec(
            (subs_per_tile * B, LANES), lambda t, *_: (t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win_w * B, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    partials = pl.pallas_call(
        _make_spmm_windowed_kernel(
            tile_k, layout.rank_nb, B, win_w, num_tiles, loop=interpret
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (layout.num_subtiles * B, LANES), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * layout.padded_nnz * B,
            bytes_accessed=layout.hbm_bytes + 4 * (n + layout.m) * B,
            transcendentals=0,
        ),
    )(
        layout.tile_b0,
        _pad_meta(layout.sub_b0, num_tiles, subs_per_tile, tpb),
        _pad_meta(layout.sub_dlo, num_tiles, subs_per_tile, tpb),
        _pad_meta(layout.sub_dhi, num_tiles, subs_per_tile, tpb),
        layout.vals, layout.lcols, x2d,
    )

    nc = layout.num_chunks
    q = layout.chunk_q
    if q:
        y = (
            partials[: nc * q * B]
            .reshape(nc, q, B, LANES)
            .sum(axis=1)
        )
    else:
        seg = jnp.repeat(layout.sub_chunk, B) * B + jnp.tile(
            jnp.arange(B, dtype=layout.sub_chunk.dtype),
            layout.num_subtiles,
        )
        sums = jax.ops.segment_sum(
            partials, seg, num_segments=(nc + 1) * B, indices_are_sorted=False
        )
        y = sums[: nc * B].reshape(nc, B, LANES)
    return y.transpose(0, 2, 1).reshape(nc * LANES, B)[: layout.m]


def _sub_loop_carry(subs_per_tile, inner_steps, body, carry0,
                    force_loop=False):
    """pallas_sell._sub_loop with loop-carried state: body(s, carry) ->
    carry. Same unroll budget, blocked-fori fallback, and interpret-mode
    force_loop rationale."""
    from tpu_spmv.kernels.pallas_sell import _BLK_CAP, _UNROLL_BUDGET

    if not force_loop and (
        subs_per_tile * max(inner_steps, 1) <= _UNROLL_BUDGET
    ):
        c = carry0
        for s in range(subs_per_tile):
            c = body(s, c)
        return c
    if force_loop:
        return jax.lax.fori_loop(0, subs_per_tile, body, carry0)
    U = 1
    while (
        U * 2 <= min(subs_per_tile, _BLK_CAP)
        and subs_per_tile % (U * 2) == 0
        and U * 2 * max(inner_steps, 1) <= _UNROLL_BUDGET
    ):
        U *= 2

    def blk(b, c):
        for u in range(U):
            c = body(b * U + u, c)
        return c

    return jax.lax.fori_loop(0, subs_per_tile // U, blk, carry0)


def _make_spmm_packed_kernel(tile_k: int, rank_nb: int, B: int,
                             groups: tuple | None, loop: bool = False):
    """SpMM over the packed mixed-height layout: the per-column
    gather/accumulate of _make_spmm_kernel fused with the 3-way static
    segmented epilogue + carry register of kernels/packed.py. The carry
    is (B, 128) — one emit boundary per sub-tile, shared by every
    column (bmeta is column-independent). groups=None selects the
    packed-delta window unpack; a tuple selects the grouped-window
    variant (grp_b0 absolute bases from SMEM)."""
    from tpu_spmv.kernels.pallas_sell import _meta_block

    subs_per_tile = tile_k // SUBLANES
    npairs = max((rank_nb + 1) // 2, 1)
    tiles_per_block, _ = _meta_block(subs_per_tile)
    grouped = groups is not None
    if grouped:
        G = max(groups) + 1
        tpb_g, _ = _meta_block(subs_per_tile * G)

    def kernel(*refs):
        if grouped:
            (grp_b0, bmeta, vals_ref, lcols_ref, x_ref, part_ref,
             carry_ref) = refs
        else:
            (sub_b0, sub_dlo, sub_dhi, bmeta, vals_ref, lcols_ref, x_ref,
             part_ref, carry_ref) = refs
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            carry_ref[...] = jnp.zeros((B, LANES), jnp.float32)

        off = jax.lax.rem(t, tiles_per_block) * subs_per_tile
        if grouped:
            goff = jax.lax.rem(t, tpb_g) * (subs_per_tile * G)
        kvec = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
        carry = carry_ref[...]

        def step(s, carry):
            lcols = lcols_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.int32
            )
            vals = vals_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.float32
            )
            idx = jax.lax.bitwise_and(lcols, LANES - 1)
            sel = jax.lax.shift_right_logical(lcols, 7)
            if grouped:
                bases_g = [grp_b0[goff + s * G + gi] for gi in range(G)]
            else:
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
            accs = [jnp.zeros((SUBLANES, LANES), jnp.float32)] * B
            for p in range(npairs):
                # One (2B, 128) load covers both window blocks of the
                # pair-step for every column (see module doc).
                if grouped:
                    wins_g = [
                        x_ref[pl.ds((bases_g[gi] + 2 * p) * B, 2 * B), :]
                        for gi in range(G)
                    ]
                    wins = [wins_g[groups[r]] for r in range(SUBLANES)]
                else:
                    wins = [
                        x_ref[pl.ds((bases[r] + 2 * p) * B, 2 * B), :]
                        for r in range(SUBLANES)
                    ]
                for b in range(B):
                    xw0 = jnp.concatenate(
                        [w[b : b + 1] for w in wins], axis=0
                    )
                    xw1 = jnp.concatenate(
                        [w[B + b : B + b + 1] for w in wins], axis=0
                    )
                    g0 = jnp.take_along_axis(
                        xw0, idx, axis=1, mode="promise_in_bounds"
                    )
                    g1 = jnp.take_along_axis(
                        xw1, idx, axis=1, mode="promise_in_bounds"
                    )
                    if rank_nb == 2:
                        accs[b] = jnp.where(sel == 0, g0, g1)
                    else:
                        accs[b] = (
                            accs[b]
                            + jnp.where(sel == 2 * p, g0, 0.0)
                            + jnp.where(sel == 2 * p + 1, g1, 0.0)
                        )

            meta = bmeta[off + s]
            b1 = jax.lax.bitwise_and(meta, 15)
            b2 = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(meta, 4), 15
            )
            emit = jax.lax.shift_right_logical(meta, 8) >= 1
            mA = kvec < b1
            mAB = kvec < b2
            newc = []
            for b in range(B):
                prod = vals * accs[b]
                sA = jnp.sum(
                    jnp.where(mA, prod, 0.0), axis=0, keepdims=True
                )
                sAB = jnp.sum(
                    jnp.where(mAB, prod, 0.0), axis=0, keepdims=True
                )
                tot = jnp.sum(prod, axis=0, keepdims=True)
                cb = carry[b : b + 1]
                part_ref[pl.ds((2 * s) * B + b, 1), :] = jnp.where(
                    emit, cb + sA, 0.0
                )
                part_ref[pl.ds((2 * s + 1) * B + b, 1), :] = sAB - sA
                newc.append(jnp.where(emit, tot - sAB, cb + tot))
            return jnp.concatenate(newc, axis=0)

        carry = _sub_loop_carry(
            subs_per_tile, (2 * npairs + 3) * B, step, carry,
            force_loop=loop,
        )
        carry_ref[...] = carry

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def spmm_packed(layout, X: jax.Array, interpret: bool = False) -> jax.Array:
    """Y = A @ X with A in the packed mixed-height layout (X resident).

    The packed layouts win on the irregular file classes (fem/delaunay/
    road, ~25% lower fill + gather epilogue — ROUND5_SUMMARY item 1), so
    serving batches on those classes should not have to fall back to
    the quantized ranked layout. Grid tile is chosen at call time (the
    packed metadata is re-blocked per call), shrunk B-aware like
    spmm_ranked."""
    from tpu_spmv.formats.packed import PackedRanked  # noqa: F401 (doc)
    from tpu_spmv.kernels.pallas_sell import (
        _UNROLL_BUDGET, _meta_block, _pad_meta,
    )

    n, B = X.shape
    total_k = int(layout.vals.shape[0])
    tile_k = layout.tile_k
    npairs = max((layout.rank_nb + 1) // 2, 1)
    inner = (2 * npairs + 3) * B
    while (
        _B_AWARE_SHRINK
        and tile_k > 512
        and (tile_k // SUBLANES) * inner > _UNROLL_BUDGET
        and total_k % (tile_k // 2) == 0
    ):
        tile_k //= 2
    num_tiles = total_k // tile_k
    subs_per_tile = tile_k // SUBLANES

    reads_nb = 2 * npairs
    n_pad = _round_up(max(layout.n, LANES), LANES) + reads_nb * LANES
    nblocks = n_pad // LANES
    Xp = jnp.zeros((nblocks * LANES, B), jnp.float32)
    Xp = jax.lax.dynamic_update_slice(Xp, X.astype(jnp.float32), (0, 0))
    x2d = (
        Xp.reshape(nblocks, LANES, B)
        .transpose(0, 2, 1)
        .reshape(nblocks * B, LANES)
    )

    tpb, block_elems = _meta_block(subs_per_tile)
    smem1d = pl.BlockSpec(
        (block_elems,), lambda t: (t // tpb,), memory_space=pltpu.SMEM
    )
    if layout.group_code:
        G = max(layout.groups) + 1
        kernel = _make_spmm_packed_kernel(
            tile_k, layout.rank_nb, B, layout.groups, loop=interpret
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
        kernel = _make_spmm_packed_kernel(
            tile_k, layout.rank_nb, B, None, loop=interpret
        )
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # staged X, resident
        ],
        out_specs=pl.BlockSpec(
            (2 * subs_per_tile * B, LANES), lambda t: (t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((B, LANES), jnp.float32)],
    )

    partials = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (2 * layout.num_subtiles * B, LANES), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * layout.padded_nnz * B,
            bytes_accessed=layout.hbm_bytes + 4 * (n + layout.m) * B,
            transcendentals=0,
        ),
    )(*meta, layout.vals, layout.lcols, x2d)

    # Each chunk's total is in exactly one statically known partial row
    # j = out_row[c]; with B columns that row becomes rows j*B .. j*B+B-1.
    idx = (
        jnp.asarray(layout.out_row, jnp.int32)[:, None] * B
        + jnp.arange(B, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    y = jnp.take(partials, idx, axis=0)
    nc = layout.out_row.shape[0]
    return (
        y.reshape(nc, B, LANES)
        .transpose(0, 2, 1)
        .reshape(nc * LANES, B)[: layout.m]
    )
