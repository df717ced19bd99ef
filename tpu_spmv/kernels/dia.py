"""Pallas SpMV over the DIA (diagonal-offset) layout.

For stencil-class matrices (see formats/dia.py) the gather disappears:
x[row + off] for a whole (rows_per_tile, 128) block is two VMEM row
loads plus one static lane-rotation (pltpu.roll with a compile-time
shift), because off = 128 * qb + s splits into a block offset qb and a
lane shift s shared by every row. Grid-aligned stencil offsets
(|off| % 128 == 0, e.g. the +/-1024 arms of a 1024-grid 5-point
Laplacian) are a single aligned load.

Per diagonal per (rows_per_tile, 128) block: 1-2 loads, 0-2 rolls,
0-1 select, 1 fma — ~2-6 VPU ops vs the slab kernels' per-sub-tile
gather machinery, with 4 B/nnz of HBM traffic (no column indices, no
partials). y is written exactly once by the grid's output block.

Role-equivalent of the reference's density-dispatched kernel family
(spmv-csr/spmv-avx512.c lt4/gt4, reformat-auto's per-structure format
choice) for the grid-stencil end of its benchmark set.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_spmv.formats.dia import DiaSlabs
from tpu_spmv.formats.sell import LANES


def _split_offset(off: int) -> tuple[int, int]:
    """off = 128 * qb + s with s in [0, 128)."""
    s = off % LANES
    return (off - s) // LANES, s


def _make_dia_kernel(offsets: tuple, rb: int, glo: int, interpret: bool):
    """Kernel specialized on the static offset tuple (D unrolled)."""
    def roll_lanes(a, s):
        # Left-rotate by s expressed as a right-rotate by LANES - s:
        # pltpu.roll rejects negative shifts (Mosaic requirement). Both
        # branches share the shift CONSTANT, so interpret-mode tests pin
        # it — but they run jnp.roll, not the Mosaic lowering of
        # pltpu.roll. Direction parity of the two ops cannot be unit-
        # tested (pltpu.roll has no interpret path); it is pinned by
        # the on-chip validation runs instead — every dia sweep row has
        # unaligned arms (lap2d offsets +-1 -> s=1/127) and validates
        # wrong=0 against the serial oracle (results/sweep_*_r5.csv).
        shift = (LANES - s) % LANES
        if interpret:
            return jnp.roll(a, shift, axis=1)
        return pltpu.roll(a, shift, axis=1)

    def kernel(vals_ref, x_ref, y_ref):
        t = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
        acc = jnp.zeros((rb, LANES), jnp.float32)
        for k, off in enumerate(offsets):
            qb, s = _split_offset(off)
            base = t * rb + (glo + qb)
            a = x_ref[pl.ds(base, rb), :]
            if s == 0:
                shifted = a
            else:
                # One roll instead of two: selecting PRE-roll with the
                # rotated mask (lane < s takes b) is algebraically the
                # post-roll blend — roll(a,s)[l] for l < 128-s needs
                # in[l+s] = a[l+s] (j = l+s in [s,128)), roll(b,s) for
                # l >= 128-s needs b[j], j = l+s-128 in [0,s).
                b = x_ref[pl.ds(base + 1, rb), :]
                shifted = roll_lanes(jnp.where(lane < s, b, a), s)
            acc = acc + vals_ref[0, k].astype(jnp.float32) * shifted
        y_ref[...] = acc

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def spmv_dia(layout: DiaSlabs, x: jax.Array, interpret: bool = False) -> jax.Array:
    """y = A @ x with A in DIA layout. x: (n,) float32 -> y: (m,)."""
    d = layout.num_diagonals
    rb = layout.rows_per_tile // LANES
    nb = layout.num_blocks
    num_tiles = nb // rb

    qbs = [_split_offset(o)[0] for o in layout.offsets]
    glo = max(0, -min(qbs))
    # High guard: the farthest base+1 block read plus the rb-row window.
    ghi = max(max(qbs) + 2, 1)
    n_blocks = glo + nb + ghi
    x2d = jnp.zeros((n_blocks * LANES,), jnp.float32)
    x2d = jax.lax.dynamic_update_slice(
        x2d, x.astype(jnp.float32), (glo * LANES,)
    ).reshape(n_blocks, LANES)

    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            # Tile-major vals: step t's (1, d, rb, 128) block is one
            # contiguous region — a single linear DMA (see DiaSlabs).
            pl.BlockSpec(
                (1, d, rb, LANES), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x, fully resident
        ],
        out_specs=pl.BlockSpec(
            (rb, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
    )

    y = pl.pallas_call(
        _make_dia_kernel(layout.offsets, rb, glo, interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, LANES), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * layout.vals.size,
            bytes_accessed=layout.hbm_bytes,
            transcendentals=0,
        ),
    )(layout.vals, x2d)

    return y.reshape(-1)[: layout.m]


# NOTE: the guard-window setup (qbs/glo/ghi/x padding) appears in
# spmv_dia, spmv_dia_windowed, and dia_x_fits, and the roll-blend
# accumulate body in both kernel makers — deliberate specializations
# (the windowed variant re-bases x windows at 0). Any change to the
# ghi formula or the single-roll blend must be mirrored; the fuzz and
# dia suites run both kernels on the same matrices.
def _make_dia_windowed_kernel(offsets: tuple, rb: int, glo: int,
                              win_w: int, num_tiles: int, interpret: bool):
    """HBM-windowed DIA kernel: x stays in HBM; each grid step DMAs its
    x window (win_w = glo + rb + ghi blocks — affine in t, no metadata)
    into a double-buffered VMEM scratch while the previous step
    computes. Removes the VMEM residency cap on n (the resident kernel
    needs x fully in VMEM, ~4M columns — ROUND3_SUMMARY known limit)."""
    def roll_lanes(a, s):
        shift = (LANES - s) % LANES
        if interpret:
            return jnp.roll(a, shift, axis=1)
        return pltpu.roll(a, shift, axis=1)

    def kernel(vals_ref, x_hbm, y_ref, xwin, sems):
        t = pl.program_id(0)
        slot = jax.lax.rem(t, 2)
        nslot = jax.lax.rem(t + 1, 2)

        def win_dma(which_slot, which_tile):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(which_tile * rb, win_w), :],
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

        lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
        acc = jnp.zeros((rb, LANES), jnp.float32)
        for k, off in enumerate(offsets):
            qb, s = _split_offset(off)
            base = glo + qb  # window-local: the window starts at t*rb
            a = xwin[slot, pl.ds(base, rb), :]
            if s == 0:
                shifted = a
            else:
                b = xwin[slot, pl.ds(base + 1, rb), :]
                shifted = roll_lanes(jnp.where(lane < s, b, a), s)
            acc = acc + vals_ref[0, k].astype(jnp.float32) * shifted
        y_ref[...] = acc

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def spmv_dia_windowed(
    layout: DiaSlabs, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """y = A @ x with x streamed from HBM in per-tile windows.

    Same layout and results as spmv_dia; choose this when x does not fit
    the VMEM residency budget — VMEM use is O(rows_per_tile + window),
    not O(n)."""
    d = layout.num_diagonals
    rb = layout.rows_per_tile // LANES
    nb = layout.num_blocks
    num_tiles = nb // rb

    qbs = [_split_offset(o)[0] for o in layout.offsets]
    glo = max(0, -min(qbs))
    ghi = max(max(qbs) + 2, 1)
    win_w = glo + rb + ghi
    # The double-buffered x window lives in Mosaic's scoped VMEM
    # (16 MB): far-flung diagonal offsets make glo/ghi — and thus the
    # scratch — arbitrarily large, which would surface as an opaque
    # Mosaic compile error. Refuse with the actual reason (review r5).
    if 2 * win_w * LANES * 4 > 12 * 2**20:
        raise ValueError(
            f"windowed DIA x-window is {win_w} blocks "
            f"({2 * win_w * LANES * 4 / 2**20:.0f} MB double-buffered),"
            f" beyond the VMEM scratch budget — the diagonal offsets "
            f"span too far; use a gather kernel (ranked/striped) for "
            f"this structure"
        )
    # Padded x in HBM: window t covers blocks [t*rb, t*rb + win_w) of
    # the padded array; real x starts at block glo.
    n_blocks = glo + nb + ghi
    x2d = jnp.zeros((n_blocks * LANES,), jnp.float32)
    x2d = jax.lax.dynamic_update_slice(
        x2d, x.astype(jnp.float32), (glo * LANES,)
    ).reshape(n_blocks, LANES)

    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, d, rb, LANES), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # x, HBM-resident
        ],
        out_specs=pl.BlockSpec(
            (rb, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win_w, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    y = pl.pallas_call(
        _make_dia_windowed_kernel(
            layout.offsets, rb, glo, win_w, num_tiles, interpret
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, LANES), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * layout.vals.size,
            bytes_accessed=layout.hbm_bytes,
            transcendentals=0,
        ),
    )(layout.vals, x2d)

    return y.reshape(-1)[: layout.m]


def dia_x_fits(layout: DiaSlabs, budget_frac: float = 0.5) -> bool:
    """True when the resident kernel's VMEM working set (padded x + the
    double-buffered diagonal tiles + y tile) fits budget_frac of VMEM.

    The tile terms scale with rows_per_tile, which is a free knob —
    charging them at the LAYOUT's tile would flip this check on
    wide-diagonal matrices whose x fits trivially, sending callers to
    the windowed kernel (which pays the same tile terms) instead of
    shrinking the tile (review r5). Budget the tiles at the smallest
    admissible tile (1024 rows) and leave tile sizing to the kernel."""
    from tpu_spmv.kernels.pallas_sell import VMEM_BYTES

    qbs = [_split_offset(o)[0] for o in layout.offsets]
    glo = max(0, -min(qbs))
    ghi = max(max(qbs) + 2, 1)
    n_pad = (glo + layout.num_blocks + ghi) * LANES
    rb_min = 1024 // LANES
    tiles = 2 * layout.num_diagonals * rb_min * LANES * (
        layout.vals.dtype.itemsize
    )
    y_tiles = 2 * rb_min * LANES * 4
    return 4 * n_pad + tiles + y_tiles <= budget_frac * VMEM_BYTES()


def spmv_dia_reference(layout: DiaSlabs, x) -> "np.ndarray":
    """NumPy oracle over the layout itself (tests)."""
    import numpy as np

    # Tile-major (T, d, rb, 128) -> diagonal-major flat (d, rows).
    vals = (
        np.asarray(layout.vals, dtype=np.float32)
        .transpose(1, 0, 2, 3)
        .reshape(layout.num_diagonals, -1)
    )
    n_rows = vals.shape[1]
    xp = np.zeros(n_rows + 2 * n_rows, np.float32)  # generous guard
    off0 = n_rows
    xp[off0 : off0 + layout.n] = np.asarray(x, np.float32)
    y = np.zeros(n_rows, np.float32)
    rows = np.arange(n_rows)
    for k, off in enumerate(layout.offsets):
        y += vals[k] * xp[off0 + rows + off]
    return y[: layout.m]
