"""Flagship Pallas SpMV kernels over the SELL-slab layouts.

Role-equivalent of the reference's tuned CSR-k kernels (CSRk_Graph::SpMV
spmv-csrk/csrk.cpp:149-330 and cuSpMV_2/3/3_vec
cuda-spmv-csrk/cuda/csrk.cu:184-391), designed for the TPU memory system
instead of translated:

  grid step  = one (TILE_K, 128) slab tile streamed from HBM (large DMAs,
               double-buffered by the Pallas pipeline)
  sub-tile   = (8, 128) VREG: 8 nonzero slots x 128 rows of one chunk
  gather     = hardware 128-lane dynamic-gather from VMEM-resident x

Three kernels share that frame (pick via tune.tpu_plan):
  spmv_sell   — per-sub-tile windows [b0, b0+nb): loop over every block
                the whole sub-tile touches (cheap iterations; the span is
                the RCM bandwidth)
  spmv_ranked — per-SUBLANE windows with cluster-aligned slots: 2-3
                gather steps regardless of bandwidth, paired (2,128)
                window loads (the flagship; see RankedSlabs)
  spmv_ranked_windowed — same layout with x streamed from HBM in
                per-tile windows (no VMEM residency cap on n)

Partials: one (1,128) row-sum per sub-tile; chunk totals by reshape-sum
when slab heights are uniform (chunk_q) or a sorted segment-sum
otherwise. x VMEM residency caps the resident kernels at ~3M rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_spmv.formats.sell import LANES, SUBLANES, RankedSlabs, SellSlabs


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def VMEM_BYTES() -> int:
    """Per-core VMEM of the running device (the resident kernels keep x
    fully in VMEM); resolved from device_kind, v5e fallback."""
    from tpu_spmv.hw import device_spec

    return device_spec().vmem_bytes


def _meta_block(per_tile: int) -> tuple:
    """(tiles_per_block, block_elems) for a tile-blocked 1D SMEM
    metadata array: XLA lays 1D s32 arrays out with tile T(1024), and
    Mosaic requires block shapes aligned to it, so one SMEM block covers
    k grid tiles such that k*per_tile is a multiple of 1024; the kernel
    indexes [(t % k) * per_tile + local]. Per-sub-tile metadata must be
    blocked, not scalar-prefetched: prefetch arrays are FULLY SMEM-
    resident and padded binned layouts reach several MB of metadata
    (this killed the general_500k / powerlaw_1m compiles)."""
    import math

    k = 1024 // math.gcd(per_tile, 1024)
    return k, k * per_tile


def _pad_meta(arr, num_tiles: int, per_tile: int, tiles_per_block: int):
    """Pad a (num_tiles*per_tile,) metadata array so the tile-block
    grid divides it exactly."""
    blocks = -(-num_tiles // tiles_per_block)
    target = blocks * tiles_per_block * per_tile
    pad = target - arr.shape[0]
    return jnp.pad(arr, (0, pad)) if pad else arr


def resident_x_fits(layout, budget_frac: float = 0.5, batch: int = 1) -> bool:
    """True when the resident kernels' VMEM working set (padded x + the
    double-buffered slab/partial tiles) fits `budget_frac` of VMEM.

    This replaces round 1's hardcoded 3M-row literal: measured at 4.19M
    rows (x = 16.8 MB) the resident kernel runs fine and 1.5x faster
    than the HBM-windowed variant, so the real bound is the VMEM budget.
    The half-budget default leaves room for Mosaic scratch and fusion.

    batch: right-hand-side columns — SpMM (kernels/spmm.py) stages X as
    (n_pad, B) and accumulates B-wide partials, scaling both terms.
    """
    reads_nb = 2 * max((getattr(layout, "rank_nb", 1) + 1) // 2, 1)
    n_pad = _round_up(max(layout.n, LANES), LANES) + max(
        reads_nb, getattr(layout, "max_nb", 1)
    ) * LANES
    lcol_bytes = getattr(layout, "lcols", layout.vals).dtype.itemsize
    # SellSlabs carries no tile_k; spmv_sell picks up to 2048 sublanes
    # at call time (pick_tile_k), so budget the worst case — the old
    # 512 default undercounted the tile working set 4x (review r5).
    tile_k = getattr(layout, "tile_k", 2048) or 2048
    tiles = 2 * tile_k * LANES * (4 + lcol_bytes)
    partials = 2 * (tile_k // SUBLANES) * LANES * 4 * batch
    return 4 * n_pad * batch + tiles + partials <= budget_frac * VMEM_BYTES()


def _reduce_partials(partials, layout):
    """Chunk totals from per-sub-tile partials.

    Uniform layouts (chunk_q > 0) reduce with a reshape-sum — or nothing
    at q == 1 — saving the segment-sum epilogue (~28% of flagship SpMV
    time); ragged layouts fall back to the sorted segment-sum.
    """
    q = layout.chunk_q
    nc = layout.num_chunks
    if q == 1:
        return partials[:nc].reshape(-1)[: layout.m]
    if q:
        return (
            partials[: nc * q]
            .reshape(nc, q, LANES)
            .sum(axis=1)
            .reshape(-1)[: layout.m]
        )
    chunk_sums = jax.ops.segment_sum(
        partials,
        layout.sub_chunk,
        num_segments=nc + 1,
        indices_are_sorted=True,
    )
    return chunk_sums[:-1].reshape(-1)[: layout.m]


# Code-size budget for fully unrolling the per-tile sub-tile loop:
# beyond roughly this many (sub-tile x gather-step) bodies, switch the
# OUTER sub-tile loop to lax.fori_loop. Mosaic's ~50-cycle fori overhead
# amortizes over the (large) per-sub-tile body that triggers it, while
# unbounded unrolling (e.g. 256 sub-tiles x 64-block stripe spans) blows
# up compile time and instruction memory. 6144 keeps every r2-measured
# configuration (sell span <= 24 at 256 sub-tiles, ranked pairs <= 8)
# on the proven fully-unrolled path.
_UNROLL_BUDGET = 6144
# Sub-tiles unrolled per fori iteration in _sub_loop's over-budget
# blocked path. A/B on SpMM B=8 tile=2048 (over budget; bare fori
# measured 81-90 GF/s): U=8 -> 190, U=32 -> 217 (~ the fully-unrolled
# smaller-tile number), U=128 -> 34 (instruction-memory cliff — the
# unroll budget alone is NOT a sufficient guard here). 32 sits at the
# plateau with 4x margin to the cliff.
_BLK_CAP = 32


def _sub_loop(subs_per_tile: int, inner_steps: int, body,
              force_loop: bool = False):
    """Run body(s) for s in [0, subs_per_tile): unrolled when the total
    step count fits the budget, lax.fori_loop otherwise.

    force_loop (set in interpret mode): always take the fori path. The
    interpreter lowers the kernel to plain HLO where XLA unrolls the
    one-trip grid while-loop, inlining subs_per_tile copies of the body
    (thousands of slice/select instructions) into the entry — the CPU
    algebraic simplifier then churns to its 50-run fix-point cap on
    that graph ("Algebraic simplifier is likely stuck..."). Mosaic's
    per-iteration fori cost does not exist on the CPU interpreter, so
    looping there is strictly better: small graph, no warning, faster
    test compiles.
    """
    if not force_loop and subs_per_tile * max(inner_steps, 1) <= _UNROLL_BUDGET:
        for s in range(subs_per_tile):
            body(s)
    elif force_loop:
        jax.lax.fori_loop(
            0, subs_per_tile, lambda s, c: (body(s), c)[1], 0
        )
    else:
        # Over budget on hardware: BLOCKED fori — unroll U sub-tiles
        # per loop iteration (largest power of two within the budget
        # that divides subs_per_tile). Mosaic's ~50-cycle per-iteration
        # fori cost amortizes over U bodies; the bare fori cliff
        # measured 3.5x on SpMM B=8 at 2048-sublane tiles (tile=2048
        # fori 90 GF/s vs tile=1024 unrolled 306, scratch/spmm_tile_ab).
        U = 1
        while (
            U * 2 <= min(subs_per_tile, _BLK_CAP)
            and subs_per_tile % (U * 2) == 0
            and U * 2 * max(inner_steps, 1) <= _UNROLL_BUDGET
        ):
            U *= 2

        def blk(b, c):
            for u in range(U):
                body(b * U + u)
            return c

        jax.lax.fori_loop(0, subs_per_tile // U, blk, 0)


def _make_kernel(tile_k: int, max_nb: int, tiles_per_block: int,
                 loop: bool = False):
    """Kernel with static gather control flow.

    The gather loop's trip count is concrete (Python loop) because Mosaic
    costs ~50 cycles per dynamic fori_loop iteration vs ~1.7 unrolled; it
    always runs max_nb iterations, and iterations past a sub-tile's real
    span contribute nothing (the blk == b select never fires), so no
    per-sub-tile bound is needed in-kernel. The outer sub-tile loop
    unrolls only within _UNROLL_BUDGET (column-striped layouts carry
    spans of 32-128 blocks).
    """
    subs_per_tile = tile_k // SUBLANES

    def kernel(sub_b0, vals_ref, cols_ref, x_ref, part_ref):
        off = jax.lax.rem(pl.program_id(0), tiles_per_block) * subs_per_tile

        def body(s):
            cols = cols_ref[pl.ds(s * SUBLANES, SUBLANES), :]
            vals = vals_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.float32
            )
            # Lane-local index is block-independent: hoist out of the loop.
            idx = jax.lax.bitwise_and(cols, LANES - 1)
            blk = jax.lax.shift_right_logical(cols, 7)
            b0 = sub_b0[off + s]
            acc = jnp.zeros((SUBLANES, LANES), jnp.float32)
            for i in range(max_nb):
                b = b0 + i
                xb = jnp.broadcast_to(x_ref[pl.ds(b, 1), :], (SUBLANES, LANES))
                gathered = jnp.take_along_axis(
                    xb, idx, axis=1, mode="promise_in_bounds"
                )
                acc = acc + jnp.where(blk == b, gathered, 0.0)
            part_ref[pl.ds(s, 1), :] = jnp.sum(
                vals * acc, axis=0, keepdims=True
            )

        _sub_loop(subs_per_tile, max_nb, body, force_loop=loop)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def spmv_sell(layout: SellSlabs, x: jax.Array, interpret: bool = False) -> jax.Array:
    """y = A @ x with A in SELL-slab layout. x: (n,) float32 -> y: (m,)."""
    total_k = int(layout.vals.shape[0])
    # Tile size: 512 sublanes (256KB val + 256KB col per step) unless the
    # matrix is smaller than one tile (from_csr pads total_k to tile_k).
    from tpu_spmv.formats.sell import pick_tile_k

    tile_k = pick_tile_k(total_k)
    num_tiles = total_k // tile_k
    subs_per_tile = tile_k // SUBLANES

    # Pad x with max_nb guard blocks: the static gather loop may read up to
    # b0 + max_nb - 1 past a right-edge sub-tile's span (contributions are
    # masked off, but the read must stay in bounds).
    n_pad = _round_up(max(layout.n, LANES), LANES) + layout.max_nb * LANES
    x2d = jnp.zeros((n_pad // LANES, LANES), jnp.float32)
    x2d = jax.lax.dynamic_update_slice(
        x2d.reshape(-1), x.astype(jnp.float32), (0,)
    ).reshape(n_pad // LANES, LANES)

    tpb, block_elems = _meta_block(subs_per_tile)
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (block_elems,), lambda t: (t // tpb,),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (tile_k, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_k, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x, fully resident
        ],
        out_specs=pl.BlockSpec(
            (subs_per_tile, LANES), lambda t: (t, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    partials = pl.pallas_call(
        _make_kernel(tile_k, layout.max_nb, tpb, loop=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((layout.num_subtiles, LANES), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * layout.padded_nnz,
            bytes_accessed=layout.hbm_bytes,
            transcendentals=0,
        ),
    )(_pad_meta(layout.sub_b0, num_tiles, subs_per_tile, tpb),
      layout.vals, layout.cols, x2d)

    # Coarsest reduction level: chunk totals from sub-tile partials.
    return _reduce_partials(partials, layout)


def _make_ranked_kernel(tile_k: int, rank_nb: int, loop: bool = False):
    """Rank-windowed kernel: per-sublane x windows (see RankedSlabs).

    Per sub-tile, gather iterations run in PAIRS: each sublane's 2-block
    window slice loads as one (2,128) dynamic VMEM copy (halving the
    dominant load count vs per-block loads — measured 1.4x), split by
    static row slices into the two (8,128) gather sources. At the common
    rank_nb == 2 a single select combines them; wider spans accumulate
    per pair. With cluster-aligned slots rank_nb is 2-3 after RCM vs the
    sub-tile-wide span (~bandwidth/128) the plain kernel loops over.

    Per-sub-tile metadata (sub_b0/dlo/dhi) arrives as TILE-BLOCKED SMEM
    inputs, not scalar prefetch: prefetch operands live in SMEM in FULL,
    and heavily padded binned layouts reach S > 300k sub-tiles = several
    MB of metadata, past the ~1MB SMEM budget (this killed the
    general_500k/powerlaw_1m compiles). Blocked, only the current tile's
    slice (subs_per_tile words per array) is resident.
    """
    subs_per_tile = tile_k // SUBLANES
    npairs = max((rank_nb + 1) // 2, 1)
    tiles_per_block, _ = _meta_block(subs_per_tile)

    def kernel(sub_b0, sub_dlo, sub_dhi, vals_ref, lcols_ref, x_ref, part_ref):
        off = jax.lax.rem(
            pl.program_id(0), tiles_per_block
        ) * subs_per_tile

        def body(s):
            # A paired (16,128) load + in-register split was tried for
            # bf16 tile alignment and measured WORSE (ranked+bf16 128.9
            # vs 140.8 GF/s sliced, f32 flat — docs/PERF_NOTES.md r4
            # bf16 postmortem): the bf16->f32 de-interleave costs the
            # same either way and the wider value hurt scheduling.
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
            part_ref[pl.ds(s, 1), :] = jnp.sum(
                vals * acc, axis=0, keepdims=True
            )

        _sub_loop(subs_per_tile, 2 * npairs, body, force_loop=loop)

    return kernel


# NOTE: the paired (2,128) window-load + dual-gather + sel-select body
# appears in _make_ranked_kernel, _make_grouped_kernel, and
# _make_windowed_kernel — deliberate per-variant specializations (only
# the window-load expression differs, but Mosaic codegen is sensitive
# to indirection). Any fix to the select/accumulate logic must be
# mirrored in all three; the fuzz suite runs them on shared matrices.
def _make_grouped_kernel(tile_k: int, rank_nb: int, groups: tuple,
                         loop: bool = False):
    """Grouped-window rank kernel: sublanes sharing a window (static map
    `groups`) read ONE absolute base from SMEM and issue ONE (2,128)
    load per pair-step — G loads + G scalar reads per sub-tile instead
    of 8 loads plus the 16-op packed-delta unpack (measured 3.7 cyc/
    sub-tile on the flagship; see RankedSlabs.from_csr grouping).
    grp_b0 arrives tile-blocked (sub-tile-major, G per sub-tile)."""
    subs_per_tile = tile_k // SUBLANES
    G = max(groups) + 1
    npairs = max((rank_nb + 1) // 2, 1)
    tiles_per_block, _ = _meta_block(subs_per_tile * G)

    def kernel(grp_b0, vals_ref, lcols_ref, x_ref, part_ref):
        off = jax.lax.rem(
            pl.program_id(0), tiles_per_block
        ) * (subs_per_tile * G)

        def body(s):
            lcols = lcols_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.int32
            )
            vals = vals_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.float32
            )
            idx = jax.lax.bitwise_and(lcols, LANES - 1)
            bases = [grp_b0[off + s * G + gi] for gi in range(G)]
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
                        [wins[groups[r]][0:1] for r in range(SUBLANES)], axis=0
                    )
                    xw1 = jnp.concatenate(
                        [wins[groups[r]][1:2] for r in range(SUBLANES)], axis=0
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
            part_ref[pl.ds(s, 1), :] = jnp.sum(
                vals * acc, axis=0, keepdims=True
            )

        # Unroll accounting: the grouped body issues G (2,128) loads per
        # pair-step where the ungrouped kernel (charged 2 per pair)
        # issues 8 — scale by G/8 so grouped never charges MORE than the
        # ungrouped kernel it replaces. 2*npairs*G overcharged wide-rank
        # grouped layouts into lax.fori_loop (~50 cyc/iteration) that
        # fully-unrolled r2 ran fine: the general_500k 2.5x regression.
        _sub_loop(subs_per_tile, max((2 * npairs * G) // 8, 1), body,
                  force_loop=loop)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def spmv_ranked(
    layout: RankedSlabs, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """y = A @ x with A in rank-windowed SELL layout."""
    total_k = int(layout.vals.shape[0])
    from tpu_spmv.formats.sell import pick_tile_k

    tile_k = layout.tile_k or pick_tile_k(total_k)
    num_tiles = total_k // tile_k

    # x as 128-wide blocks with guard blocks for the static gather loop
    # overrun (masked contributions, but reads must stay in bounds; the
    # paired loads read up to 2*ceil(rank_nb/2) blocks past a base).
    reads_nb = 2 * max((layout.rank_nb + 1) // 2, 1)
    n_pad = _round_up(max(layout.n, LANES), LANES) + reads_nb * LANES
    x2d = jnp.zeros((n_pad // LANES, LANES), jnp.float32)
    x2d = jax.lax.dynamic_update_slice(
        x2d.reshape(-1), x.astype(jnp.float32), (0,)
    ).reshape(n_pad // LANES, LANES)

    subs_per_tile = tile_k // SUBLANES

    def smem1d(per_tile):
        tpb, block_elems = _meta_block(per_tile)
        return pl.BlockSpec(
            (block_elems,), lambda t: (t // tpb,), memory_space=pltpu.SMEM
        )

    if layout.group_code:
        G = max(layout.groups) + 1
        kernel = _make_grouped_kernel(
            tile_k, layout.rank_nb, layout.groups, loop=interpret
        )
        tpb_g, _ = _meta_block(subs_per_tile * G)
        meta_specs = [smem1d(subs_per_tile * G)]
        meta = (
            _pad_meta(layout.grp_b0, num_tiles, subs_per_tile * G, tpb_g),
        )
    else:
        kernel = _make_ranked_kernel(tile_k, layout.rank_nb, loop=interpret)
        tpb, _ = _meta_block(subs_per_tile)
        meta_specs = [smem1d(subs_per_tile)] * 3
        meta = tuple(
            _pad_meta(a, num_tiles, subs_per_tile, tpb)
            for a in (layout.sub_b0, layout.sub_dlo, layout.sub_dhi)
        )

    grid_spec = pl.GridSpec(
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
            (subs_per_tile, LANES), lambda t: (t, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    partials = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((layout.num_subtiles, LANES), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * layout.padded_nnz,
            bytes_accessed=layout.hbm_bytes,
            transcendentals=0,
        ),
    )(*meta, layout.vals, layout.lcols, x2d)

    return _reduce_partials(partials, layout)


def _make_windowed_kernel(tile_k: int, rank_nb: int, win_w: int,
                          num_tiles: int, loop: bool = False):
    """HBM-windowed rank kernel: x stays in HBM; each grid step DMAs its
    tile's x window (win_w blocks) into a double-buffered VMEM scratch
    while the previous step computes. Removes the VMEM residency cap on
    n (the resident kernel needs x fully in VMEM, ~3M rows)."""
    subs_per_tile = tile_k // SUBLANES
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
                x_hbm.at[pl.ds(tile_b0[which_tile], win_w), :],
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
            sel = jax.lax.shift_right_logical(lcols, 7)
            acc = jnp.zeros((SUBLANES, LANES), jnp.float32)
            for p in range((rank_nb + 1) // 2):
                wins = [
                    xwin[slot, pl.ds(bases[r] + 2 * p, 2), :]
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
            part_ref[pl.ds(s, 1), :] = jnp.sum(
                vals * acc, axis=0, keepdims=True
            )

        # 2*npairs matches the resident kernel's and pad_up_tile's
        # charge — rank_nb+1 overcharged even ranks by one step and
        # could drop a budget-sized tile into blocked-fori (review r5).
        _sub_loop(
            subs_per_tile, 2 * max((rank_nb + 1) // 2, 1), body,
            force_loop=loop,
        )

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def spmv_ranked_windowed(
    layout: RankedSlabs, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """y = A @ x with x streamed from HBM in per-tile windows.

    Same layout and results as spmv_ranked; choose this when x does not
    fit VMEM (n beyond ~3M rows) — VMEM use is O(tile_k + win_w), not
    O(n)."""
    total_k = int(layout.vals.shape[0])
    tile_k = layout.tile_k
    num_tiles = total_k // tile_k
    win_w = layout.win_w

    # Guard rows: DMA source must stay in bounds for every window.
    n_blocks = _round_up(max(layout.n, LANES), LANES) // LANES + win_w
    x2d = jnp.zeros((n_blocks, LANES), jnp.float32)
    x2d = jax.lax.dynamic_update_slice(
        x2d.reshape(-1), x.astype(jnp.float32), (0,)
    ).reshape(n_blocks, LANES)

    subs_per_tile = tile_k // SUBLANES
    # tile_b0 stays scalar-prefetch: the double-buffer DMA needs the
    # NEXT tile's base (t+1 lookahead), and it is one word per tile.
    # Per-sub-tile metadata is tile-blocked SMEM (see _make_ranked_kernel).
    tpb, block_elems = _meta_block(subs_per_tile)
    smem1d = pl.BlockSpec(
        (block_elems,), lambda t, *_: (t // tpb,), memory_space=pltpu.SMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            smem1d,
            smem1d,
            smem1d,
            pl.BlockSpec(
                (tile_k, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_k, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # x, HBM-resident
        ],
        out_specs=pl.BlockSpec(
            (subs_per_tile, LANES), lambda t, *_: (t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win_w, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    partials = pl.pallas_call(
        _make_windowed_kernel(
            tile_k, layout.rank_nb, win_w, num_tiles, loop=interpret
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((layout.num_subtiles, LANES), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * layout.padded_nnz,
            bytes_accessed=layout.hbm_bytes,
            transcendentals=0,
        ),
    )(
        layout.tile_b0,
        _pad_meta(layout.sub_b0, num_tiles, subs_per_tile, tpb),
        _pad_meta(layout.sub_dlo, num_tiles, subs_per_tile, tpb),
        _pad_meta(layout.sub_dhi, num_tiles, subs_per_tile, tpb),
        layout.vals, layout.lcols, x2d,
    )

    return _reduce_partials(partials, layout)


def spmv_sell_reference(layout: SellSlabs, x: np.ndarray) -> np.ndarray:
    """NumPy emulation of the kernel's accumulation order, for tests."""
    vals = np.asarray(layout.vals)
    cols = np.asarray(layout.cols)
    xp = np.asarray(x, dtype=np.float32)
    gathered = np.where(cols < xp.shape[0], xp[np.clip(cols, 0, xp.shape[0] - 1)], 0.0)
    prods = (vals * gathered).astype(np.float32)
    total_k = vals.shape[0]
    partials = prods.reshape(total_k // SUBLANES, SUBLANES, LANES).sum(axis=1)
    y = np.zeros((layout.num_chunks + 1, LANES), dtype=np.float32)
    np.add.at(y, np.asarray(layout.sub_chunk), partials)
    return y[:-1].reshape(-1)[: layout.m]
