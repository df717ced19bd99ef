"""TPU lower-triangular solve over a pack-scheduled SELL layout.

The reference solves packs sequentially with an OpenMP barrier between
packs and row-parallel threads inside each pack (CSRk_Graph::lowerSTS,
spmv-csrk/csrk.cpp:79-145). The TPU re-design exploits the fact that a
Pallas grid on TPU executes sequentially on one core:

  * rows are laid out pack-by-pack, each pack padded to 128-row chunks
    (a chunk never straddles a pack boundary),
  * strict-L is stored as SELL slabs over the padded rows, values
    pre-scaled by 1/diag (division-free solve),
  * ONE pallas_call streams all slab tiles; a VMEM accumulator carries
    the running chunk dot-product across sub-tiles, and when the owning
    chunk changes the kernel finalizes x[chunk] = b_scaled[chunk] - acc
    into a VMEM-resident x that later sub-tiles gather from.

Dependencies are honored by construction: chunk order refines pack
order, and within a pack rows are mutually independent (tpu_spmv/sts/
host.py invariant), so every gathered x block is already final.

x stays fully VMEM-resident: systems up to ~1M rows per core.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_spmv.formats.csr import CSRMatrix
from tpu_spmv.formats.sell import LANES, SUBLANES, RankedSlabs, SellSlabs
from tpu_spmv.sts.host import TriangularSystem

# Rank-windowed solve fast path: static gather-iteration cap. Systems
# whose aligned per-sublane dependency windows exceed this span use the
# dynamic-loop kernel instead.
RANKED_SOLVE_MAX_NB = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LowerSolveLayout:
    """Device arrays for the chunked lower solve.

    Known cost characteristics (review r5): every pack pads to a
    128-row chunk, so LS schedules with many tiny levels (long
    dependency chains, e.g. near-tridiagonal L) inflate slab
    storage/work by up to ~128x vs COLOR on the same matrix —
    prefer COLOR ordering where the structure admits it. The
    ranked fast-path search below also builds up to 4 full device
    layouts and keeps one; a host-only pre-cost (shape_stats
    style) would avoid 3 discarded device transfers.
    """

    slabs: SellSlabs  # strict-L (scaled) over padded rows
    b_scale: jax.Array  # (num_chunks+1, 128) b * inv_diag, padded
    inv_diag: jax.Array  # (num_chunks+1, 128) for re-scaling new b vectors
    pad_index: jax.Array  # (m,) padded position of each real row
    m: int
    ranked: RankedSlabs | None = None  # fast path when rank windows are narrow

    def tree_flatten(self):
        children = (
            self.slabs, self.b_scale, self.inv_diag, self.pad_index,
            self.ranked,
        )
        return children, (self.m,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:4], *aux, ranked=children[4])

    @classmethod
    def build(
        cls, sys: TriangularSystem, b: np.ndarray, ranked: bool = True,
    ) -> "LowerSolveLayout":
        """Build from a host TriangularSystem and right-hand side b
        (both in the system's permuted row order). ranked=False skips
        the rank-windowed fast-path search (callers that run the
        dynamic-gather kernel unconditionally, e.g. the stacked
        block-Jacobi shards, avoid the candidate builds)."""
        L = sys.lower
        m = L.m
        lens = L.row_lengths
        if not np.all(lens >= 1):
            raise ValueError("lower factor has an empty row (missing diagonal)")
        # Columns are sorted ascending, so the diagonal is each row's last
        # entry (the reference relies on the same invariant,
        # csrk.cpp:86-88: val_L[num_edges_L[j+1]-1]).
        diag_pos = L.indptr[1:].astype(np.int64) - 1
        diag = L.data[diag_pos]
        if np.any(diag == 0.0):
            raise ValueError("zero diagonal entry; system is singular")
        inv_diag = (1.0 / diag).astype(np.float32)

        # Padded row numbering: each pack padded to a multiple of 128.
        pack_sizes = np.diff(sys.pack_ptr)
        padded_sizes = np.maximum(_round_up_arr(pack_sizes, LANES), LANES)
        pad_start = np.zeros(sys.num_packs + 1, dtype=np.int64)
        np.cumsum(padded_sizes, out=pad_start[1:])
        m_pad = int(pad_start[-1])
        row_pack = np.repeat(np.arange(sys.num_packs, dtype=np.int64), pack_sizes)
        pad_index = pad_start[row_pack] + (
            np.arange(m, dtype=np.int64) - sys.pack_ptr[row_pack]
        )

        # Strict lower (drop the diagonal = last entry per row), values
        # scaled by the owning row's inv_diag, columns remapped to padded.
        keep = np.ones(L.nnz, dtype=bool)
        keep[diag_pos] = False
        rows = np.repeat(np.arange(m, dtype=np.int64), lens)[keep]
        cols = pad_index[L.indices[keep].astype(np.int64)]
        vals = (L.data[keep].astype(np.float64) * inv_diag[rows]).astype(np.float32)
        s_indptr = np.zeros(m_pad + 1, dtype=np.int64)
        np.add.at(s_indptr, pad_index[rows] + 1, 1)
        np.cumsum(s_indptr, out=s_indptr)
        # Rows arrive grouped by original row but scattered to padded
        # positions; since pad_index is strictly increasing the order is
        # already row-major in padded space.
        strictL = CSRMatrix(
            s_indptr.astype(np.int32),
            cols.astype(np.int32),
            vals,
            (m_pad, m_pad),
        )
        slabs = SellSlabs.from_csr(strictL)

        # Rank-windowed fast path: on level schedules of locality-
        # preserving (RCM'd) systems, each sublane rank's dependencies
        # cluster into a few x blocks even though the whole sub-tile's
        # window is wide. Only taken when the static gather loop stays
        # short.
        want_ranked = ranked
        ranked = None
        if want_ranked:
            try:
                cand = RankedSlabs.from_csr(strictL)
                if cand.rank_nb <= RANKED_SOLVE_MAX_NB:
                    ranked = cand
            except ValueError:
                pass  # packed-delta range exceeded: scattered dependencies
        if want_ranked and ranked is None and strictL.nnz:
            # Scattered dependencies (the level permutation sprays each
            # row's parents across all earlier packs): column-binned
            # slots bound the gather loop at the bin width for ANY
            # structure, trading fill padding — same trade as the binned
            # SpMV mode. This replaced round 1's ~500-iteration dynamic
            # gather loop (~120ms at 32k rows; VERDICT r1 #7).
            from tpu_spmv.tune.model import _ranked_subtile_cost

            best = None
            for w in (2, 4, 8):
                try:
                    cand = RankedSlabs.from_csr(strictL, bin_blocks=w)
                except ValueError:
                    continue
                cost = cand.num_subtiles * _ranked_subtile_cost(cand.rank_nb)
                if best is None or cost < best[0]:
                    best = (cost, cand)
            if best is not None:
                ranked = best[1]

        num_chunks = slabs.num_chunks
        bpad = np.zeros((num_chunks + 1) * LANES, dtype=np.float32)
        dpad = np.zeros((num_chunks + 1) * LANES, dtype=np.float32)
        bpad[pad_index] = np.asarray(b, dtype=np.float32) * inv_diag
        dpad[pad_index] = inv_diag
        return cls(
            slabs=slabs,
            b_scale=jnp.asarray(bpad.reshape(num_chunks + 1, LANES)),
            inv_diag=jnp.asarray(dpad.reshape(num_chunks + 1, LANES)),
            pad_index=jnp.asarray(pad_index, dtype=jnp.int32),
            m=m,
            ranked=ranked,
        )


def _round_up_arr(a: np.ndarray, mult: int) -> np.ndarray:
    return -(-a // mult) * mult


_LAST_FLAG_SHIFT = 30  # sub_chunk bit 30: this sub-tile finalizes its chunk


def _flagged_sub_chunk(sub_chunk, num_chunks: int):
    """Pack the next-owner-differs lookahead into bit 30 of sub_chunk so
    the solve kernels only read tile-LOCAL metadata (tile-blocked SMEM;
    full scalar-prefetch arrays overflow SMEM on big padded layouts)."""
    ext = jnp.concatenate(
        [sub_chunk, jnp.full((1,), num_chunks + 1, sub_chunk.dtype)]
    )
    is_last = (ext[1:] != ext[:-1]).astype(sub_chunk.dtype)
    return sub_chunk | (is_last << _LAST_FLAG_SHIFT)


def _make_solve_kernel(tile_k: int, loop: bool = False):
    from tpu_spmv.kernels.pallas_sell import _meta_block, _sub_loop

    subs_per_tile = tile_k // SUBLANES
    tiles_per_block, _ = _meta_block(subs_per_tile)

    def kernel(sub_b0, sub_nb, sub_chunk, vals_ref, cols_ref, b_ref, x_ref,
               acc_ref):
        t = pl.program_id(0)
        moff = jax.lax.rem(t, tiles_per_block) * subs_per_tile

        @pl.when(t == 0)
        def _():
            x_ref[:] = jnp.zeros_like(x_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def sbody(s):
            cols = cols_ref[pl.ds(s * SUBLANES, SUBLANES), :]
            vals = vals_ref[pl.ds(s * SUBLANES, SUBLANES), :]
            idx = jax.lax.bitwise_and(cols, LANES - 1)
            blk = jax.lax.shift_right_logical(cols, 7)
            b0 = sub_b0[moff + s]

            # The pack permutation (levels/colors sorted by size) scatters
            # a row's dependencies across all earlier packs, so sub-tile
            # windows can span most of x: the gather loop must be DYNAMIC
            # with the per-sub-tile bound (a static unroll of the global
            # max explodes compile time and runs the worst case
            # everywhere).
            def body(i, gath):
                b = b0 + i
                xb = jnp.broadcast_to(
                    x_ref[pl.ds(b, 1), :], (SUBLANES, LANES)
                )
                gathered = jnp.take_along_axis(
                    xb, idx, axis=1, mode="promise_in_bounds"
                )
                return gath + jnp.where(blk == b, gathered, 0.0)

            gath = jax.lax.fori_loop(
                0, sub_nb[moff + s], body,
                jnp.zeros((SUBLANES, LANES), jnp.float32)
            )
            acc_ref[:] = acc_ref[:] + jnp.sum(
                vals * gath, axis=0, keepdims=True
            )

            # Finalize the chunk when the next sub-tile has a new owner
            # (pre-packed as bit 30 of sub_chunk).
            cf = sub_chunk[moff + s]
            c = jax.lax.bitwise_and(cf, (1 << _LAST_FLAG_SHIFT) - 1)
            is_last = jax.lax.shift_right_logical(cf, _LAST_FLAG_SHIFT) != 0

            @pl.when(is_last)
            def _():
                x_ref[pl.ds(c, 1), :] = b_ref[pl.ds(c, 1), :] - acc_ref[:]
                acc_ref[:] = jnp.zeros_like(acc_ref)

        _sub_loop(subs_per_tile, 1, sbody, force_loop=loop)

    return kernel


def _make_ranked_solve_kernel(tile_k: int, rank_nb: int, loop: bool = False):
    """Rank-windowed solve: static per-sublane gather windows (see
    RankedSlabs) + the chunk accumulate/finalize schedule."""
    from tpu_spmv.kernels.pallas_sell import _meta_block, _sub_loop

    subs_per_tile = tile_k // SUBLANES
    tiles_per_block, _ = _meta_block(subs_per_tile)

    def kernel(sub_b0, sub_dlo, sub_dhi, sub_chunk, vals_ref, lcols_ref,
               b_ref, x_ref, acc_ref):
        t = pl.program_id(0)
        moff = jax.lax.rem(t, tiles_per_block) * subs_per_tile

        @pl.when(t == 0)
        def _():
            x_ref[:] = jnp.zeros_like(x_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def sbody(s):
            lcols = lcols_ref[pl.ds(s * SUBLANES, SUBLANES), :].astype(
                jnp.int32
            )
            vals = vals_ref[pl.ds(s * SUBLANES, SUBLANES), :]
            idx = jax.lax.bitwise_and(lcols, LANES - 1)
            b0 = sub_b0[moff + s]
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
            gath = jnp.zeros((SUBLANES, LANES), jnp.float32)
            for i in range(rank_nb):
                xw = jnp.concatenate(
                    [x_ref[pl.ds(bases[r] + i, 1), :] for r in range(SUBLANES)],
                    axis=0,
                )
                gathered = jnp.take_along_axis(
                    xw, idx, axis=1, mode="promise_in_bounds"
                )
                gath = gath + jnp.where(sel == i, gathered, 0.0)
            acc_ref[:] = acc_ref[:] + jnp.sum(
                vals * gath, axis=0, keepdims=True
            )

            cf = sub_chunk[moff + s]
            c = jax.lax.bitwise_and(cf, (1 << _LAST_FLAG_SHIFT) - 1)
            is_last = jax.lax.shift_right_logical(cf, _LAST_FLAG_SHIFT) != 0

            @pl.when(is_last)
            def _():
                x_ref[pl.ds(c, 1), :] = b_ref[pl.ds(c, 1), :] - acc_ref[:]
                acc_ref[:] = jnp.zeros_like(acc_ref)

        _sub_loop(subs_per_tile, rank_nb, sbody, force_loop=loop)

    return kernel


def _lower_solve_ranked(layout, b_scale, interpret):
    rk = layout.ranked
    total_k = int(rk.vals.shape[0])
    from tpu_spmv.formats.sell import pick_tile_k

    tile_k = pick_tile_k(total_k)
    num_tiles = total_k // tile_k
    num_chunks = rk.num_chunks
    subs_per_tile = tile_k // SUBLANES
    sub_chunk_f = _flagged_sub_chunk(rk.sub_chunk, num_chunks)
    # Guard blocks: the static gather loop reads up to base + rank_nb - 1.
    x_blocks = num_chunks + 1 + rk.rank_nb

    from tpu_spmv.kernels.pallas_sell import _meta_block, _pad_meta

    tpb, block_elems = _meta_block(subs_per_tile)
    smem1d = pl.BlockSpec(
        (block_elems,), lambda t: (t // tpb,), memory_space=pltpu.SMEM
    )
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            smem1d, smem1d, smem1d, smem1d,
            pl.BlockSpec(
                (tile_k, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_k, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_scale, resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # x, resident
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.float32)],
    )
    x_pad = pl.pallas_call(
        _make_ranked_solve_kernel(tile_k, rk.rank_nb, loop=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x_blocks, LANES), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rk.padded_nnz,
            bytes_accessed=rk.hbm_bytes,
            transcendentals=0,
        ),
    )(_pad_meta(rk.sub_b0, num_tiles, subs_per_tile, tpb),
      _pad_meta(rk.sub_dlo, num_tiles, subs_per_tile, tpb),
      _pad_meta(rk.sub_dhi, num_tiles, subs_per_tile, tpb),
      _pad_meta(sub_chunk_f, num_tiles, subs_per_tile, tpb),
      rk.vals, rk.lcols, b_scale)
    return x_pad.reshape(-1)[layout.pad_index]


@partial(jax.jit, static_argnames=("interpret",))
def lower_solve(
    layout: LowerSolveLayout, b_scale: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Solve L x = b. b_scale overrides the layout's baked-in scaled rhs
    ((num_chunks+1, 128), = b_padded * inv_diag). Returns x (m,) in the
    system's permuted row order."""
    slabs = layout.slabs
    if b_scale is None:
        b_scale = layout.b_scale
    if layout.ranked is not None:
        return _lower_solve_ranked(layout, b_scale, interpret)
    x_pad = lower_solve_blocks(slabs, b_scale, interpret)
    return x_pad.reshape(-1)[layout.pad_index]


def lower_solve_blocks(
    slabs: SellSlabs, b_scale: jax.Array, interpret: bool = False,
) -> jax.Array:
    """Chunk-sequential lower solve over pre-built strict-L slabs (the
    dynamic-gather kernel); returns x as (num_chunks+1, 128) padded
    blocks WITHOUT the pad_index gather. The distributed solve
    (dist/sts.py) calls this per shard inside shard_map, where the
    host-side pad_index does not exist."""
    total_k = int(slabs.vals.shape[0])
    from tpu_spmv.formats.sell import pick_tile_k

    tile_k = pick_tile_k(total_k)
    num_tiles = total_k // tile_k
    num_chunks = slabs.num_chunks
    subs_per_tile = tile_k // SUBLANES

    # Chunk-finalize lookahead pre-packed into bit 30 (the final real
    # sub-tile always flushes: the sentinel owner differs).
    sub_chunk_f = _flagged_sub_chunk(slabs.sub_chunk, num_chunks)

    # x buffer: num_chunks real blocks + 1 pad-chunk block (the dynamic
    # gather loop never reads past a sub-tile's real span).
    x_blocks = num_chunks + 1

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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_scale, resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # x, resident
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.float32)],
    )

    x_pad = pl.pallas_call(
        _make_solve_kernel(tile_k, loop=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x_blocks, LANES), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * slabs.padded_nnz,
            bytes_accessed=slabs.hbm_bytes,
            transcendentals=0,
        ),
    )(_pad_meta(slabs.sub_b0, num_tiles, subs_per_tile, tpb),
      _pad_meta(slabs.sub_nb, num_tiles, subs_per_tile, tpb),
      _pad_meta(sub_chunk_f, num_tiles, subs_per_tile, tpb),
      slabs.vals, slabs.cols, b_scale)

    return x_pad


def lower_solve_reference(sys: TriangularSystem, b: np.ndarray) -> np.ndarray:
    """Serial forward substitution oracle (reference lowerSTS k=2 semantics,
    csrk.cpp:81-90), in float64 for a tight accuracy bar."""
    L = sys.lower
    x = np.zeros(L.m, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    indptr, indices, data = L.indptr, L.indices, L.data.astype(np.float64)
    for i in range(L.m):
        s, e = indptr[i], indptr[i + 1]
        acc = 0.0
        for j in range(s, e - 1):
            acc += data[j] * x[indices[j]]
        x[i] = (b[i] - acc) / data[e - 1]
    return x
