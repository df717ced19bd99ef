"""SELL-slab device layout: the TPU-native realization of CSR-k.

The reference's CSR-k hierarchy (super-super-rows -> super-rows -> rows,
spmv-csrk/csrk.h:253-345) maps onto TPU hardware as:

  rows        -> 128 vector lanes (one row per lane within a chunk)
  super-rows  -> row chunks of 128 rows whose nonzeros are stored as
                 ELL-style slabs: slab[k, lane] = k-th nonzero of the
                 chunk's lane-th row, padded to the chunk's max row length
                 quantized to 8 sublanes (a SELL-C-sigma layout with
                 C=128, cf. Kreutzer et al., arXiv:1307.6209)
  sub-tile    -> an (8, 128) slab block (one VREG): 8 nonzero slots for
                 all 128 rows of one chunk; the unit of gather metadata
  super-super-rows -> large contiguous tiles of TILE_K sublanes streamed
                 per Pallas grid step (DMA-amortizing)

After RCM every chunk's columns live in a narrow window, so the kernel
gathers x from VMEM with the hardware 128-lane dynamic-gather, looping
only over the x blocks each sub-tile actually touches (per-sub-tile
[b0, b0+nb) host metadata — the TPU analog of the per-super-row column
locality that makes the reference's cache blocking work).

The kernel emits one (1, 128) partial row-sum per sub-tile; chunk totals
are a sorted segment-sum over sub-tiles (cheap: padded_nnz/8 elements).
Padding slots carry val=0 and an in-range column so they are inert.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_spmv.formats.csr import CSRMatrix

LANES = 128
SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SellSlabs:
    """Device arrays + sub-tile metadata for the Pallas SELL SpMV kernel."""

    vals: jax.Array  # (total_k, 128) float32 slab values
    cols: jax.Array  # (total_k, 128) int32 absolute column ids
    sub_b0: jax.Array  # (S,) int32 first x block (col//128) per sub-tile
    sub_nb: jax.Array  # (S,) int32 number of x blocks per sub-tile
    sub_chunk: jax.Array  # (S,) int32 owning row-chunk per sub-tile (sorted)
    m: int
    n: int
    nnz: int
    num_chunks: int
    max_nb: int  # worst-case gather span, for diagnostics/tuning

    def tree_flatten(self):
        children = (self.vals, self.cols, self.sub_b0, self.sub_nb, self.sub_chunk)
        aux = (self.m, self.n, self.nnz, self.num_chunks, self.max_nb)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

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
        """Bytes streamed from HBM per SpMV (roofline denominator)."""
        return (
            self.vals.size * 4
            + self.cols.size * 4
            + 4 * (self.n + self.m)
            + self.num_subtiles * LANES * 4  # partials write+read amortized
        )

    @classmethod
    def from_csr(cls, mat: CSRMatrix, tile_k: int = 512) -> "SellSlabs":
        """Build the layout from a (preferably RCM'd) CSR matrix.

        tile_k: slab sublanes per grid step; total_k is padded to it.
        """
        m, n = mat.shape
        num_chunks = max(_round_up(m, LANES) // LANES, 1)

        lens = np.zeros(num_chunks * LANES, dtype=np.int64)
        lens[:m] = mat.row_lengths
        chunk_lens = lens.reshape(num_chunks, LANES)

        # Per-chunk slab height, quantized to 8 sublanes (one VREG), at
        # least one sub-tile per chunk.
        kc = np.maximum(
            (chunk_lens.max(axis=1) + SUBLANES - 1) // SUBLANES * SUBLANES,
            SUBLANES,
        )
        koff = np.zeros(num_chunks + 1, dtype=np.int64)
        np.cumsum(kc, out=koff[1:])
        total_k = _round_up(int(koff[-1]), tile_k)

        vals = np.zeros((total_k, LANES), dtype=np.float32)
        cols = np.full((total_k, LANES), -1, dtype=np.int64)

        # Scatter nonzeros: the j-th nonzero of row r lands at
        # (koff[chunk(r)] + rank(j), lane(r)).
        rows = np.repeat(np.arange(m, dtype=np.int64), mat.row_lengths)
        ranks = np.arange(mat.nnz, dtype=np.int64) - np.repeat(
            mat.indptr[:-1].astype(np.int64), mat.row_lengths
        )
        dest_k = koff[rows // LANES] + ranks
        dest_l = rows % LANES
        vals[dest_k, dest_l] = mat.data
        cols[dest_k, dest_l] = mat.indices

        # Per-sub-tile x block range [b0, b0+nb), padding excluded.
        num_subtiles = total_k // SUBLANES
        ucols = cols.reshape(num_subtiles, SUBLANES * LANES)
        masked = np.ma.masked_equal(ucols, -1)
        sub_b0 = masked.min(axis=1).filled(0) // LANES
        sub_bmax = masked.max(axis=1).filled(0) // LANES
        sub_nb = np.maximum(sub_bmax - sub_b0 + 1, 1)

        # Padding slots reuse the sub-tile's first block so the gather loop
        # already covers them; val=0 keeps them inert.
        pad_fill = np.broadcast_to(
            (sub_b0 * LANES).repeat(SUBLANES)[:, None], (total_k, LANES)
        )
        np.copyto(cols, pad_fill, where=(cols == -1))

        # Owning chunk per sub-tile (chunk id num_chunks for the all-pad
        # tail, dropped by the segment-sum).
        sub_chunk = np.full(num_subtiles, num_chunks, dtype=np.int64)
        real = int(koff[-1]) // SUBLANES
        sub_chunk[:real] = np.repeat(
            np.arange(num_chunks, dtype=np.int64), kc // SUBLANES
        )

        as32 = lambda a: jnp.asarray(a, dtype=jnp.int32)
        return cls(
            vals=jnp.asarray(vals),
            cols=as32(cols),
            sub_b0=as32(sub_b0),
            sub_nb=as32(sub_nb),
            sub_chunk=as32(sub_chunk),
            m=m,
            n=n,
            nnz=mat.nnz,
            num_chunks=num_chunks,
            max_nb=int(sub_nb.max()) if num_subtiles else 1,
        )
