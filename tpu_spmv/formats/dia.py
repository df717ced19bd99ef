"""DIA (diagonal-offset) layout for stencil-structured matrices.

The reference dispatches among formats by structure (CSR / CSR-2 / CSR-3
via reformat-auto's density models, AVX-512 lt4/gt4 kernels by row
density — spmv-csrk/main.c, reformat-csr-to-csr3/main-auto.c); this is
the TPU analog for the grid-stencil end of its benchmark set (ecology1,
G3_circuit, thermal2-class matrices ARE 2D/3D grid problems,
helpers/params.txt).

When every nonzero lies on one of D << m constant diagonals
(col - row = off_k), storing the matrix as D dense diagonals removes the
column indices entirely (4 B/nnz vs 6+ for val+lcol slabs) and turns the
kernel's per-lane gather into D static lane-rotations of a VMEM-resident
x — no per-sub-tile metadata, no padding beyond the diagonal ends, no
partials epilogue. y is written exactly once.

Layout: TILE-MAJOR — vals[t, k, r, l] = A[row, row + off_k] for
row = (t*rb + r)*128 + l with rb = rows_per_tile // 128 (zero where the
diagonal exits the matrix or row >= m). Grid step t's vals block is one
CONTIGUOUS (d * rows_per_tile * 128)-element region, so the Pallas
pipeline issues ONE linear DMA per step instead of d strided segments —
measured 225 -> 88 ns fixed cost per grid step on v5e, and the large
default rows_per_tile amortizes that fixed cost (8192 -> 32768 measured
261 -> 738 GF/s on the lap2d_1024 bf16 flagship, results/
dia_stream_r4.txt).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_spmv.formats.csr import CSRMatrix
from tpu_spmv.formats.sell import LANES, SUBLANES

# Planner/layout admission: more distinct diagonals than this, or more
# fill than DIA_MAX_FILL, and the slab formats win (their traffic is
# O(nnz), DIA's is O(D * m)).
DIA_MAX_DIAGS = 40
DIA_MAX_FILL = 1.6


def diagonal_profile(mat: CSRMatrix, sample_rows: int = 0):
    """(num_diagonals, fill) of the matrix's diagonal structure.

    fill = D * m / nnz is the traffic ratio DIA pays vs ideal CSR vals.
    sample_rows > 0 estimates D from that many evenly spaced rows (the
    planner's cheap probe); 0 scans every nonzero (exact, O(nnz)).
    """
    if mat.nnz == 0 or mat.m != mat.n:
        return np.iinfo(np.int32).max, float("inf")
    if sample_rows and mat.m > sample_rows:
        step = mat.m // sample_rows
        rows = np.arange(0, mat.m, step, dtype=np.int64)
        parts = []
        for r in rows:
            lo, hi = int(mat.indptr[r]), int(mat.indptr[r + 1])
            parts.append(mat.indices[lo:hi].astype(np.int64) - r)
        offs = np.unique(np.concatenate(parts)) if parts else np.zeros(0)
    else:
        rows = np.repeat(
            np.arange(mat.m, dtype=np.int64), mat.row_lengths
        )
        offs = np.unique(mat.indices.astype(np.int64) - rows)
    d = int(offs.size)
    return d, d * mat.m / max(mat.nnz, 1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DiaSlabs:
    """D dense diagonals over 128-lane row blocks (see module doc)."""

    vals: jax.Array  # (T, D, rb, 128): tile-major, rb = rows_per_tile//128
    offsets: tuple  # D static diagonal offsets (col - row), ascending
    m: int
    n: int
    nnz: int
    rows_per_tile: int  # kernel grid block height (multiple of 1024)

    def tree_flatten(self):
        return (self.vals,), (
            self.offsets, self.m, self.n, self.nnz, self.rows_per_tile,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def num_diagonals(self) -> int:
        return len(self.offsets)

    @property
    def num_blocks(self) -> int:
        return int(self.vals.shape[0] * self.vals.shape[2])

    @property
    def padding_ratio(self) -> float:
        return self.vals.size / max(self.nnz, 1)

    @property
    def hbm_bytes(self) -> int:
        # Diagonal values + x read once + y written once.
        return (
            self.vals.size * self.vals.dtype.itemsize
            + 4 * (self.n + self.m)
        )

    @classmethod
    def from_csr(
        cls,
        mat: CSRMatrix,
        max_diags: int = DIA_MAX_DIAGS,
        max_fill: float = DIA_MAX_FILL,
        rows_per_tile: int | None = None,
        val_dtype=None,
    ) -> "DiaSlabs":
        """Build the diagonal layout; raises ValueError when the matrix
        is not diagonal-structured enough (the planner's probe should
        normally have filtered it first).

        val_dtype: value storage dtype (default float32). DIA traffic is
        almost entirely values (no indices), so jnp.bfloat16 nearly
        halves the whole kernel's HBM bytes; same rounded-operator
        accuracy contract as RankedSlabs.from_csr."""
        if mat.m != mat.n:
            raise ValueError("DIA layout requires a square matrix")
        if mat.nnz == 0:
            # Zero diagonals passes both admission gates below but the
            # kernels cannot form their guard windows over an empty
            # offsets tuple (review r5): reject like any other
            # not-diagonal-structured input.
            raise ValueError("DIA layout requires a non-empty matrix")
        m = mat.m
        rows = np.repeat(np.arange(m, dtype=np.int64), mat.row_lengths)
        offs_all = mat.indices.astype(np.int64) - rows
        offsets, inverse = np.unique(offs_all, return_inverse=True)
        d = int(offsets.size)
        if d > max_diags:
            raise ValueError(
                f"{d} distinct diagonals exceeds max_diags={max_diags}"
            )
        fill = d * m / max(mat.nnz, 1)
        if fill > max_fill:
            raise ValueError(
                f"DIA fill {fill:.2f}x exceeds max_fill={max_fill}"
            )
        if rows_per_tile is None:
            # r4 measured optimum (results/dia_tilemajor_r4.txt): bf16
            # keeps gaining from bigger tiles (581 -> 661 GF/s at 64k);
            # f32 peaks at 32k (410 vs 395).
            rows_per_tile = 65536 if val_dtype == jnp.bfloat16 else 32768
        # Cap the tile height near m: a 32k-row default tile on a small
        # matrix would pad vals up to the tile quantum for nothing.
        rpt = min(rows_per_tile, -(-m // 1024) * 1024)
        rpt = max(rpt - rpt % (SUBLANES * LANES), 1024)
        rb = rpt // LANES
        nb = max(-(-m // LANES), 1)
        nb_pad = -(-nb // rb) * rb
        vals = np.zeros((d, nb_pad * LANES), np.float32)
        vals[inverse, rows] = mat.data
        # Tile-major (T, d, rb, 128): one contiguous DMA per grid step.
        vals_tm = np.ascontiguousarray(
            vals.reshape(d, nb_pad // rb, rb, LANES).transpose(1, 0, 2, 3)
        )
        return cls(
            vals=jnp.asarray(vals_tm, dtype=val_dtype or jnp.float32),
            offsets=tuple(int(o) for o in offsets),
            m=m,
            n=mat.n,
            nnz=mat.nnz,
            rows_per_tile=rpt,
        )
