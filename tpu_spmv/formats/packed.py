"""Packed rank-windowed SELL layout: mixed-height slabs, no sublane
quantum.

The r1/r2 layouts quantize every 128-row chunk's slab height to 8
sublanes (one VREG) so each (8, 128) sub-tile belongs to exactly one
chunk and reduces with a single sublane sum. On the flagship matrix
class (RCM'd 5-point grids: ~5 nonzeros/row) that quantum IS the
padding: slab height 5 rounds to 8 and the whole measured 1.60x
padding ratio is the 8/5 quantization (docs/PERF_NOTES.md r3). The
reference's CSR-k slabs have no such floor — its super-rows pack rows
back-to-back (spmv-csrk/csrk.cpp:149-330) — so this closes the gap the
TPU register shape introduced.

Here chunk slabs stack back-to-back at sublane granularity
(kc = max(true slot count, 4)), so a (8, 128) sub-tile may contain the
tail of one chunk, whole chunks, and the head of the next. Correctness
holds through a 3-way static segmented reduce per sub-tile:

    sA  = sublanes [0, b1)   completes the chunk carried in
    sB  = sublanes [b1, b2)  a chunk fully contained in this sub-tile
    sC  = sublanes [b2, 8)   carried into the next sub-tile

with (b1, b2, E) packed per sub-tile into one SMEM word. kc >= 4
guarantees at most TWO chunk ends per sub-tile (ends are >= 4 slots
apart, a sub-tile spans 7 positions), so two partial output rows per
sub-tile suffice; the carry lives in a VMEM scratch register that
persists across the (sequential) grid. Each chunk's total lands in
exactly one partial row, statically known at build time, so the
epilogue is a row GATHER (cheaper than the segment-sum the quantized
layouts need for ragged heights).

Quantum-2 slab heights were tried in round 2 and measured DEAD — but
that variant flushed chunks in-kernel with per-group scalar loads and
dynamic (1,128) stores (docs/PERF_NOTES.md). This design has neither:
all stores are static (rows 2s, 2s+1), the only new scalar load is the
bmeta word, and the segmented reduce is two extra masked sums.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_spmv.formats.csr import CSRMatrix
from tpu_spmv.formats.sell import (
    LANES,
    SUBLANES,
    _aligned_slots,
    _binned_slots,
    _round_up,
    group_windows,
    pad_up_tile,
)

# Minimum slab height: bounds chunk ends per 8-slot sub-tile to two
# (consecutive ends are >= MIN_KC apart; a sub-tile spans 7 positions).
MIN_KC = 4


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedRanked:
    """Mixed-height rank-windowed slabs (see module docstring).

    Storage matches RankedSlabs (vals/lcols/sub_b0/sub_dlo/sub_dhi)
    plus:
      bmeta     (S,) int32: b1 | b2 << 4 | E << 8 — the sub-tile's
                segment boundaries and end count
      out_row   (num_chunks,) int32: flat partial-row index (2s or
                2s+1) where this chunk's total is emitted
    """

    vals: jax.Array
    lcols: jax.Array
    sub_b0: jax.Array
    sub_dlo: jax.Array
    sub_dhi: jax.Array
    bmeta: jax.Array
    out_row: jax.Array
    m: int
    n: int
    nnz: int
    num_chunks: int
    rank_nb: int
    tile_k: int
    # Grouped absolute window bases (see sell.group_windows); the
    # grouped kernel replaces the 8-load packed-delta unpack with G
    # scalar reads + G loads. group_code == 0 disables grouping.
    grp_b0: jax.Array = None
    group_code: int = 0

    def tree_flatten(self):
        children = (
            self.vals, self.lcols, self.sub_b0, self.sub_dlo,
            self.sub_dhi, self.bmeta, self.out_row, self.grp_b0,
        )
        aux = (
            self.m, self.n, self.nnz, self.num_chunks, self.rank_nb,
            self.tile_k, self.group_code,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:7], *aux[:6], grp_b0=children[7],
                   group_code=aux[6])

    def save(self, path, matrix=None, config: tuple = ()) -> None:
        from tpu_spmv.formats.sell import _save_layout

        _save_layout(self, path, matrix, config)

    @property
    def groups(self) -> tuple:
        """Static sublane->group map decoded from group_code."""
        return tuple((self.group_code >> (4 * r)) & 15 for r in range(SUBLANES))

    @property
    def num_subtiles(self) -> int:
        return int(self.sub_b0.shape[0])

    @property
    def padded_nnz(self) -> int:
        return int(self.vals.shape[0]) * LANES

    @property
    def padding_ratio(self) -> float:
        return self.padded_nnz / max(self.nnz, 1)

    @property
    def hbm_bytes(self) -> int:
        return (
            self.vals.size * self.vals.dtype.itemsize
            + self.lcols.size * self.lcols.dtype.itemsize
            + 4 * (self.n + self.m)
            + 2 * self.num_subtiles * LANES * 4  # two partial rows/sub-tile
        )

    @classmethod
    def from_csr(
        cls, mat: CSRMatrix, tile_k: int = 2048, allow_groups: bool = True,
        val_dtype=None, bin_blocks: int = 0,
    ) -> "PackedRanked":
        """val_dtype: slab value storage dtype (default float32);
        jnp.bfloat16 halves the value traffic — see
        RankedSlabs.from_csr for the accuracy contract.

        bin_blocks > 0: column-binned slot assignment (_binned_slots)
        instead of cluster-aligned — the irregular-matrix mode. Binned
        slots bound every slot's gather window to `bin_blocks` x blocks
        on matrices with no band clusters (fem/delaunay/road classes),
        and the packed mixed heights remove the 8-sublane quantum that
        dominates their fill under RankedSlabs (r4: fem_1m W=2 fill
        4.16x quantized; the in-kernel carry emit also replaces the
        segment-sum epilogue that was 44% of its SpMV time).

        Engagement limit (review r5): bin_blocks > 0 reuses
        _binned_slots, whose <=255-block window-delta repair runs
        on the QUANTIZED 8-slot groups — packed re-segments slabs
        at kc granularity, so cross-chunk jumps on scattered
        structure can exceed the packed-delta range and raise
        here (callers fall back to RankedSlabs; every scattered
        sweep row does this by design, results/scattered_r5.txt).
        Repairing at packed granularity is the known extension.

        NOTE: the window/delta/pad host build mirrors
        RankedSlabs.from_csr (sell.py) — keep fixes in sync.
        """
        m, n = mat.shape
        num_chunks = max(_round_up(m, LANES) // LANES, 1)

        if bin_blocks:
            ranks, kc_raw = _binned_slots(mat, bin_blocks)
        else:
            ranks, kc_raw = _aligned_slots(mat)
        kc = np.maximum(kc_raw, MIN_KC)
        koff = np.zeros(num_chunks + 1, dtype=np.int64)
        np.cumsum(kc, out=koff[1:])
        # 512-sublane quantum here; pad_up_tile below (once
        # rank_nb/group_code are known) pads total_k UP to the largest
        # unroll-safe grid tile — the same grid-step fixed-cost
        # amortization as RankedSlabs.from_csr.
        total_k = _round_up(int(koff[-1]), 512)

        # int32 throughout: at high-fill irregular structure the padded
        # (total_k, 128) temporaries dominate build memory, and int64
        # doubles them for column ids that always fit 31 bits (same
        # lesson as SellSlabs._host_build, review r5).
        vals = np.zeros((total_k, LANES), dtype=np.float32)
        cols = np.full((total_k, LANES), -1, dtype=np.int32)
        rows = np.repeat(np.arange(m, dtype=np.int64), mat.row_lengths)
        dest_k = koff[rows // LANES] + ranks
        dest_l = rows % LANES
        vals[dest_k, dest_l] = mat.data
        cols[dest_k, dest_l] = mat.indices

        # Per-(global sublane) windows over real slots, as in
        # RankedSlabs.from_csr — the window machinery never cared which
        # chunk a sublane belongs to.
        S = total_k // SUBLANES
        units = np.where(cols >= 0, cols >> 7, np.iinfo(np.int32).max)
        big = units.reshape(S, SUBLANES, LANES)
        sub_base = big.min(axis=2)
        empty = sub_base == np.iinfo(np.int32).max
        tile_min = sub_base.min(axis=1)
        tile_min[tile_min == np.iinfo(np.int32).max] = 0
        sub_base = np.where(empty, tile_min[:, None], sub_base)

        # Grouped absolute window bases (same machinery as RankedSlabs:
        # the grouping is a pure function of per-sublane window extents,
        # sell.group_windows — mixed chunk heights do not change it).
        real = cols >= 0
        group_code = 0
        grp_b0 = np.zeros(0, np.int32)
        if allow_groups and S:
            hi_units = np.where(real, units, -1).reshape(
                S, SUBLANES, LANES
            ).max(axis=2)
            hi_units = np.where(hi_units < 0, sub_base, hi_units)
            rank_nb0 = int((hi_units - sub_base).max()) + 1
            sub_base, grp_b0, group_code = group_windows(
                sub_base, hi_units, rank_nb0
            )

        base_cols = np.repeat(
            sub_base.reshape(-1), LANES
        ).reshape(total_k, LANES)
        lcols = np.where(real, cols - (base_cols << 7), 0)
        lmax = int(lcols.max()) if S else 0
        rank_nb = (lmax >> 7) + 1 if S else 1
        if S and int(lcols.min()) < 0:
            raise ValueError("window base exceeds its own entries")
        # uint8 when rank_nb <= 2 (see RankedSlabs.from_csr): 1B/slot
        # column indices on the irregular W<=2 binned classes.
        lcols = lcols.astype(
            np.uint8 if lmax < 2**8
            else np.int16 if lmax < 2**15
            else np.int32
        )

        sub_b0 = sub_base.min(axis=1)
        deltas = sub_base - sub_b0[:, None]
        if deltas.size and deltas.max() > 255:
            raise ValueError(
                "sub-tile block span exceeds the packed-delta range "
                "(256 blocks); use SellSlabs for this matrix"
            )
        deltas = deltas.astype(np.uint32)
        sub_dlo = np.zeros(S, dtype=np.uint32)
        sub_dhi = np.zeros(S, dtype=np.uint32)
        for r in range(4):
            sub_dlo |= deltas[:, r] << (8 * r)
            sub_dhi |= deltas[:, r + 4] << (8 * r)

        # Segment metadata: chunk c's slots end at koff[c+1]-1, i.e. it
        # completes in sub-tile (koff[c+1]-1) // 8 at boundary position
        # koff[c+1] - 8s in (0, 8].
        ends = koff[1:]  # exclusive end slot per chunk
        s_of = (ends - 1) // SUBLANES
        bpos = ends - s_of * SUBLANES  # in (0, 8]
        # Rank of each end within its sub-tile (0 = first, 1 = second):
        # chunk ids ascend with end position, so rank = count of earlier
        # chunks sharing the sub-tile.
        start_idx = np.searchsorted(s_of, np.arange(S), side="left")
        rank_in = np.arange(num_chunks, dtype=np.int64) - start_idx[s_of]
        out_row = 2 * s_of + rank_in

        b1 = np.zeros(S, dtype=np.int64)
        b2 = np.zeros(S, dtype=np.int64)
        E = np.zeros(S, dtype=np.int64)
        np.add.at(E, s_of, 1)
        if int(E.max(initial=0)) > 2:
            # kc >= MIN_KC bounds chunk ends to two per 8-slot sub-tile;
            # a third end would fold a chunk total into the carry
            # SILENTLY — raise, never assert (review r5: -O strips
            # asserts and this guards data corruption, not debugging).
            raise ValueError(
                ">2 chunk ends in one sub-tile (MIN_KC violated)"
            )
        # First end's boundary -> b1; second -> b2 (else b2 = b1).
        b1[s_of[rank_in == 0]] = bpos[rank_in == 0]
        b2[:] = b1
        b2[s_of[rank_in == 1]] = bpos[rank_in == 1]
        bmeta = (b1 | (b2 << 4) | (E << 8)).astype(np.int32)

        # Grid tile: pad total_k UP to the largest unroll-safe tile
        # (pad_up_tile). Pad sub-tiles are inert: vals=0 (prod=0),
        # lcols=0, bmeta=0 (E=0 -> nothing emitted; the carry only
        # accumulates zeros past the last real chunk end, which lands
        # at koff[-1] <= the unpadded total_k). Window bases replicate
        # the last real sub-tile so gather loads stay in-bounds.
        tile_eff = pad_up_tile(total_k, tile_k, rank_nb, group_code)
        pad_k = -total_k % tile_eff
        if pad_k:
            pad_s = pad_k // SUBLANES
            vals = np.concatenate(
                [vals, np.zeros((pad_k, LANES), vals.dtype)]
            )
            lcols = np.concatenate(
                [lcols, np.zeros((pad_k, LANES), lcols.dtype)]
            )
            sub_b0 = np.concatenate(
                [sub_b0, np.full(pad_s, sub_b0[-1], sub_b0.dtype)]
            )
            sub_dlo = np.concatenate(
                [sub_dlo, np.zeros(pad_s, sub_dlo.dtype)]
            )
            sub_dhi = np.concatenate(
                [sub_dhi, np.zeros(pad_s, sub_dhi.dtype)]
            )
            bmeta = np.concatenate(
                [bmeta, np.zeros(pad_s, bmeta.dtype)]
            )
            if group_code:
                G_eff = group_code >> 32
                grp_b0 = np.concatenate(
                    [grp_b0, np.zeros(pad_s * G_eff, grp_b0.dtype)]
                )
            total_k += pad_k

        as32 = lambda a: jnp.asarray(
            a.view(np.int32) if a.dtype == np.uint32 else a,
            dtype=jnp.int32,
        )
        return cls(
            vals=jnp.asarray(vals, dtype=val_dtype or jnp.float32),
            lcols=jnp.asarray(lcols),
            sub_b0=as32(sub_b0.astype(np.int32)),
            sub_dlo=as32(sub_dlo),
            sub_dhi=as32(sub_dhi),
            bmeta=as32(bmeta),
            out_row=as32(out_row.astype(np.int32)),
            m=m,
            n=n,
            nnz=mat.nnz,
            num_chunks=num_chunks,
            rank_nb=rank_nb,
            tile_k=tile_eff,
            grp_b0=jnp.asarray(grp_b0),
            group_code=group_code,
        )
