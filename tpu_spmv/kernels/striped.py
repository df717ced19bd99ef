"""Column-striped multi-pass SpMV: scattered matrices beyond the VMEM
x-budget.

The resident rank-windowed kernels need x fully in VMEM and the
HBM-windowed kernel needs per-tile band locality — a scattered matrix
with >~4M columns had neither (VERDICT r2 missing #2/#4; the reference's
CSR-k kernel is structure-agnostic at any scale,
spmv-csrk/csrk.cpp:149-330, because CPUs have caches + hardware gather).

Here the column space is cut into stripes of `stripe_cols` columns
(sized to the device VMEM budget). Each stripe keeps every row's
stripe-local nonzeros as an independent column-binned RankedSlabs
layout over n = stripe_cols, so each pass is the PROVEN single-chip
binned kernel with its x slice VMEM-resident:

    y = sum_p A_p @ x[p*stripe_cols : (p+1)*stripe_cols]

Traffic is O(padded nnz) for the slabs plus passes * O(m) for the y
accumulation (plus one guaranteed sub-tile per (chunk, stripe) — the
empty-chunk floor). All stripes are padded to identical array shapes
and driven by ONE lax.scan step, so exactly one Pallas kernel is
compiled regardless of the stripe count.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_spmv.formats.csr import CSRMatrix
from tpu_spmv.formats.sell import LANES, RankedSlabs
from tpu_spmv.kernels.pallas_sell import _round_up, spmv_ranked


def default_stripe_cols() -> int:
    """Stripe width sized so the x slice uses <= ~1/8 of VMEM (leaves
    room for the double-buffered slab tiles and partials)."""
    from tpu_spmv.hw import device_spec

    return _round_up(device_spec().vmem_bytes // (8 * 4), LANES)


def _pad0(a, target):
    a = np.asarray(a)
    pad = target - a.shape[0]
    if pad == 0:
        return a
    fill = np.zeros((pad,) + a.shape[1:], a.dtype)
    return np.concatenate([a, fill])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StripedRanked:
    """Per-stripe RankedSlabs stacked on a leading stripe dimension."""

    vals: jax.Array  # (P, total_k, 128)
    lcols: jax.Array  # (P, total_k, 128) stripe-local columns
    sub_b0: jax.Array  # (P, S)
    sub_dlo: jax.Array  # (P, S)
    sub_dhi: jax.Array  # (P, S)
    sub_chunk: jax.Array  # (P, S)
    tile_b0: jax.Array  # (P, T)
    m: int
    n: int
    nnz: int
    stripe_cols: int
    num_stripes: int
    num_chunks: int
    rank_nb: int
    tile_k: int
    bin_blocks: int

    def tree_flatten(self):
        children = (
            self.vals, self.lcols, self.sub_b0, self.sub_dlo, self.sub_dhi,
            self.sub_chunk, self.tile_b0,
        )
        aux = (
            self.m, self.n, self.nnz, self.stripe_cols, self.num_stripes,
            self.num_chunks, self.rank_nb, self.tile_k, self.bin_blocks,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def padded_nnz(self) -> int:
        return int(self.vals.shape[0] * self.vals.shape[1]) * LANES

    @property
    def padding_ratio(self) -> float:
        return self.padded_nnz / max(self.nnz, 1)

    @property
    def hbm_bytes(self) -> int:
        return (
            self.vals.size * self.vals.dtype.itemsize
            + self.lcols.size * self.lcols.dtype.itemsize
            + 4 * (self.n + self.num_stripes * self.m)
            + self.sub_b0.size * LANES * 4
        )

    def _stripe_struct(self, vals, lcols, sub_b0, sub_dlo, sub_dhi,
                       sub_chunk, tile_b0) -> RankedSlabs:
        return RankedSlabs(
            vals=vals, lcols=lcols, sub_b0=sub_b0, sub_dlo=sub_dlo,
            sub_dhi=sub_dhi, sub_chunk=sub_chunk, tile_b0=tile_b0,
            m=self.num_chunks * LANES, n=self.stripe_cols, nnz=self.nnz,
            num_chunks=self.num_chunks, rank_nb=self.rank_nb,
            chunk_q=0, win_w=0, tile_k=self.tile_k,
            grp_b0=jnp.zeros(0, jnp.int32), group_code=0,
        )

    @classmethod
    def from_csr(
        cls, mat: CSRMatrix, stripe_cols: int | None = None,
        bin_blocks: int = 16, val_dtype=None,
    ) -> "StripedRanked":
        """Cut columns into stripes and build one binned RankedSlabs per
        stripe (rows unchanged; stripe p's columns relabeled by
        -p*stripe_cols). All stripes pad to common shapes. val_dtype
        follows RankedSlabs.from_csr (bf16 halves value traffic)."""
        m, n = mat.shape
        sc = stripe_cols or default_stripe_cols()
        sc = _round_up(sc, LANES)
        P = max(-(-n // sc), 1)
        if P == 1:
            raise ValueError(
                f"matrix has {n} columns <= one stripe ({sc}); use "
                "RankedSlabs directly"
            )

        rows = np.repeat(
            np.arange(m, dtype=np.int64), mat.row_lengths
        )
        stripe_of = mat.indices.astype(np.int64) // sc
        stripes = []
        for p in range(P):
            sel = stripe_of == p
            rp = rows[sel]
            indptr = np.zeros(m + 1, dtype=np.int64)
            np.add.at(indptr, rp + 1, 1)
            np.cumsum(indptr, out=indptr)
            sub = CSRMatrix(
                indptr.astype(np.int32),
                (mat.indices[sel].astype(np.int64) - p * sc).astype(np.int32),
                mat.data[sel],
                (m, sc),
            )
            stripes.append(
                RankedSlabs.from_csr(
                    sub, bin_blocks=bin_blocks, allow_groups=False,
                    val_dtype=val_dtype,
                )
            )

        total_k = max(int(s.vals.shape[0]) for s in stripes)
        S = max(s.num_subtiles for s in stripes)
        T = max(int(s.tile_b0.shape[0]) for s in stripes)
        num_chunks = stripes[0].num_chunks
        rank_nb = max(s.rank_nb for s in stripes)
        tile_k = min(s.tile_k for s in stripes)
        # Widest ACTUAL stripe dtype — forcing >= int16 silently gave
        # back the uint8 column-traffic win on all-W<=2 stripe stacks
        # (review r5).
        lcol_dtype = max(
            (np.asarray(s.lcols).dtype for s in stripes),
            key=lambda d: d.itemsize,
        )
        # Padding sub-tiles: chunk id num_chunks (dropped by the
        # segment-sum), window base 0 (in-bounds; vals 0 keep it inert).
        return cls(
            vals=jnp.asarray(
                np.stack([_pad0(s.vals, total_k) for s in stripes])
            ),
            lcols=jnp.asarray(np.stack([
                _pad0(np.asarray(s.lcols).astype(lcol_dtype), total_k)
                for s in stripes
            ])),
            sub_b0=jnp.asarray(
                np.stack([_pad0(s.sub_b0, S) for s in stripes])
            ),
            sub_dlo=jnp.asarray(
                np.stack([_pad0(s.sub_dlo, S) for s in stripes])
            ),
            sub_dhi=jnp.asarray(
                np.stack([_pad0(s.sub_dhi, S) for s in stripes])
            ),
            sub_chunk=jnp.asarray(np.stack([
                np.concatenate([
                    np.asarray(s.sub_chunk),
                    np.full(
                        S - s.num_subtiles, num_chunks,
                        np.asarray(s.sub_chunk).dtype,
                    ),
                ])
                for s in stripes
            ])),
            tile_b0=jnp.asarray(
                np.stack([_pad0(s.tile_b0, T) for s in stripes])
            ),
            m=m,
            n=n,
            nnz=mat.nnz,
            stripe_cols=sc,
            num_stripes=P,
            num_chunks=num_chunks,
            rank_nb=rank_nb,
            tile_k=tile_k,
            bin_blocks=bin_blocks,
        )


@partial(jax.jit, static_argnames=("interpret",))
def spmv_striped(
    layout: StripedRanked, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """y = A @ x accumulated over column-stripe passes (one lax.scan
    step per stripe -> a single compiled Pallas kernel)."""
    sc = layout.stripe_cols
    P = layout.num_stripes
    xs = jnp.zeros((P * sc,), jnp.float32)
    xs = jax.lax.dynamic_update_slice(
        xs, x.astype(jnp.float32), (0,)
    ).reshape(P, sc)

    m_out = layout.num_chunks * LANES

    def step(acc, operand):
        vals, lcols, sub_b0, sub_dlo, sub_dhi, sub_chunk, tile_b0, xp = (
            operand
        )
        lay_p = layout._stripe_struct(
            vals, lcols, sub_b0, sub_dlo, sub_dhi, sub_chunk, tile_b0
        )
        y_p = spmv_ranked(lay_p, xp, interpret=interpret)
        return acc + y_p, None

    y, _ = jax.lax.scan(
        step,
        jnp.zeros((m_out,), jnp.float32),
        (
            layout.vals, layout.lcols, layout.sub_b0, layout.sub_dlo,
            layout.sub_dhi, layout.sub_chunk, layout.tile_b0, xs,
        ),
    )
    return y[: layout.m]
