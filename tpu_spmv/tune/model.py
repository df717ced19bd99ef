"""Parameter models: density-based tuning.

Two families:

  * reference_gpu_params — the reference's published per-architecture
    density models for CSR-3 super(-super)-row sizes, kept for
    reformat-auto file compatibility and as priors
    (volta: cuda-spmv-csrk/cuda/spmv-auto-volta.cu:132-158,
     ampere: spmv-auto-ampere.cu:130-158,
     mi100: hip/spmv-auto-mi100.cu:132-133,
     legacy: helpers/csr3params.m:14-37).

  * tpu_plan — the TPU analog: picks the kernel (Pallas SELL vs the
    XLA segment-sum fallback) and layout knobs from matrix structure.
    The SELL kernel's cost is ~(fixed + 1.7 cycles x gather-span) per
    8x128 sub-tile, so the decision variable is the post-RCM column
    span per 128-row chunk, not raw density.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


def reference_gpu_params(density: float, arch: str = "ampere") -> dict:
    """(ssrs, srs, vec, veclevel, blockDims) from the density d = nnz/m."""
    d = max(float(density), 1e-9)
    ln = math.log(d)

    def r(v):  # round-half-up like the reference's floor(x + 0.5)
        return int(math.floor(v + 0.5))

    if arch == "ampere":
        ssrs, srs = r(9.175 - 1.32 * ln), r(20.5 - 3.5 * ln)
        vec, veclevel, bx, by = False, 4, 8, 12
        if 8.0 < d <= 16.0:
            vec, srs = True, ssrs * 4
        elif 16.0 < d <= 32.0:
            vec, veclevel, by = True, 8, 8
            ssrs = r(ssrs * 2.5)
            srs = ssrs * 3
        elif 32.0 < d <= 64.0:
            vec, veclevel, by = True, 16, 4
            ssrs *= 2
            srs = ssrs * 2
        elif d > 64.0:
            vec, veclevel, by = True, 32, 2
            ssrs = r(ssrs * 2.7)
            srs = r(ssrs / 4)
    elif arch == "volta":
        ssrs, srs = r(8.89888 - 1.25 * ln), r(10.14618 - 1.5 * ln)
        vec, veclevel, bx, by = False, 4, 8, 12
        if 8.0 < d <= 16.0:
            vec = True
            ssrs = r(ssrs * 1.5)
            srs = ssrs * 2
        elif 16.0 < d <= 32.0:
            vec, veclevel, by = True, 8, 8
            ssrs *= 4
            srs = ssrs >> 1
        elif 32.0 < d <= 64.0:
            vec, veclevel, by = True, 16, 4
            ssrs *= 5
            srs = ssrs >> 1
        elif d > 64.0:
            vec, veclevel, by = True, 32, 2
            ssrs *= 5
            srs = ssrs >> 1
    elif arch == "mi100":
        ssrs, srs = r(8.489 - 1.15 * ln), r(10.711 - 1.607 * ln)
        vec, veclevel, bx, by = False, 4, 8, 12
    elif arch == "legacy":
        ssrs = r(3.333 + 20.0 / (d * max(ln, 1e-9)))
        srs = r(0.667 * ssrs + 2.667)
        vec, veclevel, bx, by = False, 4, 8, 12
    else:
        raise ValueError(f"unknown arch {arch!r}")
    return {
        "ssrs": max(ssrs, 1),
        "srs": max(srs, 1),
        "vec": vec,
        "veclevel": veclevel,
        "block_dims": (bx, by),
    }


@dataclasses.dataclass
class TpuPlan:
    kernel: str  # 'ranked' | 'sell' | 'packed' | 'dia' | 'segsum'
    tile_k: int
    needs_rcm: bool
    est_max_nb: float  # per-chunk span estimate (plain-kernel loop count)
    est_rank_nb: float  # per-rank span estimate (ranked-kernel loop count)
    reason: str
    bin_blocks: int = 0  # >0: ranked kernel over column-binned slots
    est_cost: float = 0.0  # plain-iteration units (relative)
    sigma: int = 0  # >0: SELL-C-sigma row-sort window worth applying


# The SELL kernel gathers x block-by-block; beyond this span per chunk
# the unrolled gather loop's compute exceeds any streaming win over the
# XLA fallback, and the unrolled code size explodes.
_SPAN_LIMIT = 96
# Measured on v5e (docs/PERF_NOTES.md): a ranked-kernel gather iteration
# costs ~1.4x a plain-kernel iteration since the paired (2,128) window
# loads (it was ~3.5x with per-block loads), so rank windows pay once
# they shrink the loop by more than this factor (margin included).
_RANKED_ITER_COST = 1.6
# Ranked-kernel sub-tile cost model in plain-iteration units (~4 VPU ops
# each), calibrated on v5e from the general_50k bin-width sweep (r2):
# t/sub-tile fits 2.08 + 0.58*pairs in arb units = 13 + 3.7*pairs cycles
# — the per-sub-tile FIXED cost (slab loads, scalar base unpacking,
# sublane reduce) dominates the pair-steps.
_RANKED_FIXED = 3.3
_PAIR_COST = 0.95
# Slab-streaming floor per sub-tile: 8x128x6B at ~3.5KB per unit.
_TRAFFIC_FLOOR = 1.7
# Candidate column-bin widths (x blocks) for the scattered-matrix mode.
# For uniformly random structure, fill scales ~1/W while the pair cost
# scales ~W/2, so the product approaches an asymptote from above — the
# wide entries (32, 64) matter for very sparse scattered rows (lane-
# sparse bins); their kernels run the fori sub-tile loop.
_BIN_WIDTHS = (1, 2, 4, 8, 16, 32, 64)
# Stripe widths: column-binned slots driven by the PLAIN kernel. Narrow
# bins trade Poisson fill (HBM traffic) for a short gather loop; at wide
# bins the fill collapses toward 1x (large per-bin counts) while the
# plain kernel's block-loop stays under _SPAN_LIMIT — the padding-free
# scattered path (cost = subtiles x span instead of subtiles x fill).
_STRIPE_WIDTHS = (16, 32, 64)
# DIA per-diagonal cost per (8,128) row unit, in plain-iteration units:
# the kernel does 1-2 VMEM x loads + <=2 lane rolls + 1 fma and streams
# 8x128x4B of diagonal values (2/3 of a slab sub-tile's 6B/slot), so
# one diagonal step is cheaper than one gather step but not free.
_DIA_STEP_COST = 1.1
# Packed mixed-height per-sub-tile surcharge over the ranked cost: the
# 3-way static segmented reduce (two extra masked sums + the bmeta SMEM
# word) and the gather epilogue. Derived from the r4 lap2d head-to-head
# (ranked 4.34 units/sub-tile at 8192 sub-tiles, packed ~7.3 at 5378);
# overridable by on-chip calibration like ranked_fixed/pair_cost.
_PACKED_OVER = 3.0
# XLA segment-sum epilogue charge per sub-tile for RAGGED quantized
# layouts (sell/ranked when slab heights vary, so _reduce_partials
# cannot reshape-sum): measured on fem_1m r5, 210us over 28416
# sub-tiles = 7.4 ns/sub ~= 3.3 plain-iteration units — 44% of that
# row's SpMV time. Uniform layouts (chunk_q > 0) and packed (in-kernel
# carry emit + gather epilogue) pay ~none. Without this term the model
# preferred ranked over packed on every file matrix while the chip
# measured the opposite.
_EPI_COST = 3.3


def exact_rank_nb(mat, align: bool = True, slots=None) -> tuple[int, int]:
    """(chunk span, per-slot span) in x blocks, exact, O(nnz) NumPy.

    chunk span drives the plain SELL kernel's gather loop; per-slot span
    drives the rank-windowed kernel's. align=True measures the
    cluster-aligned slot assignment RankedSlabs actually builds
    (formats/sell._aligned_slots); False measures ordinal ranks.
    slots: precomputed (ranks, kc) from _aligned_slots, to avoid a
    duplicate clustering pass when the caller already built it.
    """
    from tpu_spmv.formats.sell import LANES, _aligned_slots

    m = mat.m
    lens = mat.row_lengths.astype(np.int64)
    if mat.nnz == 0 or m == 0:
        return 1, 1
    rows = np.repeat(np.arange(m, dtype=np.int64), lens)
    if align:
        ranks, kc_raw = slots if slots is not None else _aligned_slots(mat)
        maxlen = int(kc_raw.max())
    else:
        maxlen = int(lens.max())
        ranks = np.arange(mat.nnz, dtype=np.int64) - np.repeat(
            mat.indptr[:-1].astype(np.int64), lens
        )
    blocks = mat.indices.astype(np.int64) >> 7
    chunks = rows // LANES
    nchunks = int(chunks.max()) + 1

    key = chunks * maxlen + ranks
    if nchunks * maxlen <= 8 * max(mat.nnz, 1):
        lo = np.full(nchunks * maxlen, np.iinfo(np.int64).max)
        hi = np.full(nchunks * maxlen, -1)
        np.minimum.at(lo, key, blocks)
        np.maximum.at(hi, key, blocks)
        used = hi >= 0
        rank_nb = int((hi[used] - lo[used]).max()) + 1 if used.any() else 1
    else:
        # Sparse path: one very long row on a multi-million-row matrix makes
        # nchunks*maxlen scratch dwarf nnz (ADVICE r1). Sort by key and take
        # per-group extrema via reduceat over group starts.
        order = np.argsort(key, kind="stable")
        kb = blocks[order]
        starts = np.flatnonzero(
            np.concatenate(([True], key[order][1:] != key[order][:-1]))
        )
        glo = np.minimum.reduceat(kb, starts)
        ghi = np.maximum.reduceat(kb, starts)
        rank_nb = int((ghi - glo).max()) + 1 if starts.size else 1

    clo = np.full(nchunks, np.iinfo(np.int64).max)
    chi = np.full(nchunks, -1)
    np.minimum.at(clo, chunks, blocks)
    np.maximum.at(chi, chunks, blocks)
    cused = chi >= 0
    chunk_nb = int((chi[cused] - clo[cused]).max()) + 1 if cused.any() else 1
    return chunk_nb, rank_nb


def _exact_chunk_nb(mat) -> int:
    """Max per-128-row-chunk column span in x blocks (O(nnz), vectorized)."""
    from tpu_spmv.formats.sell import LANES

    if mat.nnz == 0 or mat.m == 0:
        return 1
    rows = np.repeat(
        np.arange(mat.m, dtype=np.int64), mat.row_lengths
    )
    chunks = rows // LANES
    blocks = mat.indices.astype(np.int64) >> 7
    nchunks = int(chunks.max()) + 1
    clo = np.full(nchunks, np.iinfo(np.int64).max)
    chi = np.full(nchunks, -1)
    np.minimum.at(clo, chunks, blocks)
    np.maximum.at(chi, chunks, blocks)
    used = chi >= 0
    return int((chi[used] - clo[used]).max()) + 1 if used.any() else 1


def _sample_chunks(mat, max_chunks: int = 256):
    """Row-sliced submatrix of evenly spaced 128-row chunks (columns kept).

    Slot assignment is independent per chunk, so per-chunk layout stats
    (slab heights, padding) measured on the sample extrapolate linearly;
    returns (submatrix, scale) with scale = total_chunks / sampled.
    """
    from tpu_spmv.formats.sell import LANES

    m = mat.m
    num_chunks = max(-(-m // LANES), 1)
    if num_chunks <= max_chunks:
        return mat, 1.0
    from tpu_spmv.formats.csr import CSRMatrix

    pick = np.unique(
        np.linspace(0, num_chunks - 1, max_chunks).astype(np.int64)
    )
    indptr = [np.zeros(1, np.int64)]
    indices, data = [], []
    total = 0
    ip = mat.indptr.astype(np.int64)
    for c in pick:
        r0, r1 = c * LANES, min((c + 1) * LANES, m)
        e0, e1 = int(ip[r0]), int(ip[r1])
        indptr.append(ip[r0 + 1 : r1 + 1] - e0 + total)
        indices.append(mat.indices[e0:e1])
        data.append(mat.data[e0:e1])
        total += e1 - e0
        if r1 - r0 < LANES:  # tail chunk: keep 128-row framing via pad rows
            indptr.append(np.full(LANES - (r1 - r0), total, np.int64))
    sub = CSRMatrix(
        np.concatenate(indptr).astype(np.int32),
        np.concatenate(indices),
        np.concatenate(data).astype(np.float32),
        (pick.shape[0] * LANES, mat.n),
    )
    return sub, num_chunks / pick.shape[0]


def _subtiles_from_kc(kc) -> int:
    from tpu_spmv.formats.sell import SUBLANES

    kcq = np.maximum((kc + SUBLANES - 1) // SUBLANES, 1)
    return int(kcq.sum())


def _cal(name: str, default: float) -> float:
    """Cost-model constant with a per-device measured override
    (hw.kernel_calibration, written by tools/tune.py --calibrate)."""
    from tpu_spmv.hw import kernel_calibration

    try:
        return float(kernel_calibration().get(name, default))
    except (TypeError, ValueError):
        return default


def _ranked_subtile_cost(rank_nb: int) -> float:
    pairs = max((rank_nb + 1) // 2, 1)
    return max(
        _cal("ranked_fixed", _RANKED_FIXED)
        + _cal("pair_cost", _PAIR_COST) * pairs,
        _TRAFFIC_FLOOR,
    )


def _epi_cost(kc) -> float:
    """Per-sub-tile segment-sum epilogue charge for a quantized layout
    with the given per-chunk (unquantized) slab heights: zero when the
    quantized heights are uniform (_reduce_partials reshape-sums), the
    measured _EPI_COST otherwise (ragged -> XLA segment-sum)."""
    from tpu_spmv.formats.sell import SUBLANES

    kcq = np.maximum((np.asarray(kc) + SUBLANES - 1) // SUBLANES, 1)
    if kcq.size and (kcq == kcq[0]).all():
        return 0.0
    return _cal("epi_cost", _EPI_COST)


def _packed_x_fits(mat, rank_nb: int) -> bool:
    """Mirror of kernels.pallas_sell.resident_x_fits for the planner:
    spmv_packed keeps x fully VMEM-resident (no windowed variant), so
    the packed candidate is admitted only when padded x plus the
    double-buffered slab tiles fit half of VMEM."""
    import types

    from tpu_spmv.kernels.pallas_sell import resident_x_fits

    shim = types.SimpleNamespace(
        rank_nb=max(rank_nb, 1), n=mat.n, max_nb=1, tile_k=2048,
        vals=np.zeros(0, np.float32), lcols=np.zeros(0, np.int16),
    )
    return resident_x_fits(shim)


def tpu_plan(mat, assume_rcm: bool = False, exact: bool = True) -> TpuPlan:
    """Choose kernel + layout parameters from matrix structure.

    Minimizes a measured v5e cost model (plain-iteration units) over the
    candidate layouts: plain SELL (chunk-span loop), cluster-aligned
    rank windows, and column-binned rank windows at several bin widths
    (the scattered-matrix mode — the reference's CSR-k is structure-
    agnostic, spmv-csrk/csrk.cpp:149-330, so ours must be too).

    mat: CSRMatrix (ideally already RCM'd; set assume_rcm if so).
    exact=True measures real spans (O(nnz), sampled beyond 256 chunks);
    False estimates from band percentiles only.
    """
    from tpu_spmv.formats.sell import (
        LANES, SUBLANES, _aligned_slots, _binned_slots,
    )

    m = mat.m
    bands = mat.row_bands()
    est_span_cols = float(np.percentile(bands, 95)) + LANES if m else 1.0
    est_nb = est_span_cols / LANES
    est_rank = est_nb
    candidates = []  # (cost, kernel, bin_blocks, reason)

    sampled = None
    if exact and mat.nnz and int(mat.row_lengths.max()) <= 2048:
        chunk_nb = _exact_chunk_nb(mat)  # global: the sell loop is static
        sampled, scale = _sample_chunks(mat)
        # Aligned rank span on the sample (the full _aligned_slots pass
        # is the layout build itself); the build recomputes the true
        # global rank_nb, so this only steers the choice. The slots are
        # shared with the s_ali sub-tile count below (one clustering
        # pass, not two).
        ali_slots = _aligned_slots(sampled)
        _, rank_nb = exact_rank_nb(sampled, slots=ali_slots)
        est_nb, est_rank = float(chunk_nb), float(rank_nb)

        lens = sampled.row_lengths.astype(np.int64)
        nch = max(-(-sampled.m // LANES), 1)
        lpad = np.zeros(nch * LANES, np.int64)
        lpad[: sampled.m] = lens
        kc_ord = lpad.reshape(nch, LANES).max(axis=1)
        s_ord = _subtiles_from_kc(kc_ord) * scale
        if est_nb <= _SPAN_LIMIT:
            # The sell body pays the same per-sub-tile fixed cost as the
            # ranked kernels (slab loads, sublane reduce, store) on top
            # of its per-block gather iterations; without the fixed term
            # the model predicted 103us for road_2m's span-3 loop where
            # the chip measured 264 (r5, scratch/r5_chip_batch1.py) and
            # mis-picked sell over packed-aligned (217us measured).
            candidates.append((
                s_ord * (_cal("ranked_fixed", _RANKED_FIXED)
                         + max(est_nb, _TRAFFIC_FLOOR)
                         + _epi_cost(kc_ord)),
                "sell", 0,
                f"plain gather loop over chunk span {est_nb:.0f} blocks",
            ))

        s_ali = _subtiles_from_kc(ali_slots[1]) * scale
        if est_rank <= 250:
            candidates.append((
                s_ali * (_ranked_subtile_cost(int(est_rank))
                         + _epi_cost(ali_slots[1])),
                "ranked", 0,
                f"aligned rank windows, span {est_rank:.0f} blocks",
            ))

        # Packed mixed-height candidate (VERDICT r3 next #4: the auto
        # row must never lose to the manual packed row): same aligned
        # slots WITHOUT the 8-sublane quantum — kc = max(true, 4), slabs
        # stacked back-to-back — paying the segmented-reduce surcharge
        # per sub-tile. Offered only when x fits the VMEM residency
        # budget (spmv_packed has no HBM-windowed variant).
        if est_rank <= 250 and _packed_x_fits(mat, int(est_rank)):
            kc_pk = np.maximum(ali_slots[1], 4)  # formats.packed.MIN_KC
            s_pk = (-(-int(kc_pk.sum()) // SUBLANES)) * scale
            candidates.append((
                s_pk * (_ranked_subtile_cost(int(est_rank))
                        + _cal("packed_over", _PACKED_OVER)),
                "packed", 0,
                f"packed mixed-height slabs, span {est_rank:.0f} blocks "
                f"(pad {s_pk * SUBLANES * LANES / max(mat.nnz, 1):.2f}x)",
            ))

        for w in _BIN_WIDTHS:
            if w * LANES >= 2 * max(mat.n, 1):
                break
            try:
                _, kc_bin = _binned_slots(sampled, w)
            except ValueError:
                continue
            s_bin = _subtiles_from_kc(kc_bin) * scale
            candidates.append((
                s_bin * (_ranked_subtile_cost(w) + _epi_cost(kc_bin)),
                "ranked", w,
                f"column-binned rank windows, W={w} blocks, "
                f"padding {s_bin * SUBLANES * LANES / max(mat.nnz, 1):.1f}x",
            ))
            # Packed-binned: same bins without the 8-sublane quantum
            # (kc = max(true widths, 4), slabs back-to-back) plus the
            # in-kernel carry emit instead of the segment-sum epilogue.
            # On the reference's fem/delaunay/road file classes the
            # quantum is most of the fill and the epilogue was 44% of
            # SpMV time (r5 on-chip decomposition), so this candidate
            # usually wins there. x must be VMEM-resident (spmv_packed
            # has no HBM-windowed variant).
            if _packed_x_fits(mat, w):
                kc_pk = np.maximum(kc_bin, 4)  # formats.packed.MIN_KC
                s_pk = (-(-int(kc_pk.sum()) // SUBLANES)) * scale
                candidates.append((
                    s_pk * (_ranked_subtile_cost(w)
                            + _cal("packed_over", _PACKED_OVER)),
                    "packed", w,
                    f"packed column-binned slabs, W={w} blocks (pad "
                    f"{s_pk * SUBLANES * LANES / max(mat.nnz, 1):.2f}x)",
                ))

        # Column-stripe candidates: binned slots at wide W under the
        # PLAIN kernel. Every sub-tile pays the static global span, so
        # measure it on the sample's real layout (cheap: <=256 chunks;
        # shape_stats is the host-only path — the planner must never
        # trigger JAX backend init).
        from tpu_spmv.formats.sell import SellSlabs

        for w in _STRIPE_WIDTHS:
            if w * LANES >= 2 * max(mat.n, 1):
                break
            try:
                n_sub, span = SellSlabs.shape_stats(sampled, bin_blocks=w)
            except ValueError:
                continue
            if span > _SPAN_LIMIT:
                continue
            s_str = n_sub * scale
            candidates.append((
                s_str * (_cal("ranked_fixed", _RANKED_FIXED)
                         + max(float(span), _TRAFFIC_FLOOR)),
                "sell", w,
                f"column-striped plain kernel, W={w} blocks "
                f"(span {span}, padding "
                f"{s_str * SUBLANES * LANES / max(mat.nnz, 1):.1f}x)",
            ))

        # DIA candidate: stencil-structured matrices drop the gather and
        # the column indices entirely (formats/dia.py). Cheap sampled
        # probe first; exact profile only when the sample passes both
        # admission gates (diag count AND fill — a diagonal-count pass
        # alone admits e.g. tridiagonal-plus-dense-row shapes whose
        # exact scan is the same O(nnz) as _exact_chunk_nb anyway).
        from tpu_spmv.formats.dia import (
            DIA_MAX_DIAGS, DIA_MAX_FILL, diagonal_profile,
        )

        d_s, _ = diagonal_profile(mat, sample_rows=256)
        if d_s <= DIA_MAX_DIAGS:
            d_x, fill_x = diagonal_profile(mat)
            if d_x <= DIA_MAX_DIAGS and fill_x <= DIA_MAX_FILL:
                units = max(-(-m // (SUBLANES * LANES)), 1)
                candidates.append((
                    units * max(d_x * _DIA_STEP_COST, _TRAFFIC_FLOOR),
                    "dia", 0,
                    f"{d_x} constant diagonals, fill {fill_x:.2f}x — "
                    "index-free DIA kernel",
                ))

    needs_rcm = not assume_rcm and est_nb > 8 and m > LANES

    # SELL-C-sigma recommendation (the reference's AVX-512 lt4/gt4 role,
    # spmv-intrin.c:119-223: short-row handling by density dispatch; here
    # skewed row lengths cost slab padding instead). Recommend the local
    # row sort when it cuts ordinal sub-tile count by >20% — it permutes
    # rows only within sigma-row windows, so band locality survives.
    sigma = 0
    if sampled is not None and sampled.nnz:
        from tpu_spmv.formats.sell import sigma_sort

        lens = sampled.row_lengths.astype(np.int64)
        nch = max(-(-sampled.m // LANES), 1)
        lpad = np.zeros(nch * LANES, np.int64)
        lpad[: sampled.m] = lens
        s_now = _subtiles_from_kc(lpad.reshape(nch, LANES).max(axis=1))
        cand_sigma = 32 * LANES
        sorted_sub, _ = sigma_sort(sampled, cand_sigma)
        lpad[: sampled.m] = sorted_sub.row_lengths
        s_sorted = _subtiles_from_kc(lpad.reshape(nch, LANES).max(axis=1))
        if s_sorted < 0.8 * s_now:
            sigma = cand_sigma

    if not candidates:
        # Estimation-only path (exact=False or degenerate matrix): keep
        # the round-1 span-threshold heuristics.
        ric = _cal("ranked_iter_cost", _RANKED_ITER_COST)
        if est_nb > _SPAN_LIMIT and est_rank * ric > _SPAN_LIMIT:
            kernel, bin_blocks, reason = "segsum", 0, (
                f"chunk span ~{est_nb:.0f} blocks exceeds {_SPAN_LIMIT}; "
                "XLA segment-sum"
            )
        elif est_nb > ric * est_rank and est_rank <= 250:
            kernel, bin_blocks, reason = "ranked", 0, (
                f"rank span {est_rank:.0f} vs chunk span {est_nb:.0f}"
            )
        else:
            kernel, bin_blocks, reason = "sell", 0, (
                f"chunk span {est_nb:.0f} vs rank span {est_rank:.0f}"
            )
        cost = 0.0
    else:
        cost, kernel, bin_blocks, reason = min(candidates, key=lambda c: c[0])
        if "pad" in reason:
            # Padding-floor classes (uniformly scattered structure): the
            # chosen minimum can still carry 10-80x fill. That is the
            # cost-model optimum — every lower-pad candidate is slower
            # (docs/PERF_NOTES.md r5 "scattered floor") — but flag it so
            # sweep rows and users see the class, not a silent 73x.
            import re

            m_pad = re.search(r"pad(?:ding)? ([0-9.]+)x", reason)
            if m_pad and float(m_pad.group(1)) > 8.0:
                reason += " [padding-floor class: scattered structure;"\
                    " see PERF_NOTES scattered-floor model]"

    if kernel == "dia":
        # Any symmetric permutation (RCM) or row sort (sigma) destroys
        # the constant-diagonal structure the candidate was scored on.
        needs_rcm = False
        sigma = 0

    return TpuPlan(
        kernel=kernel,
        tile_k=2048,
        needs_rcm=needs_rcm,
        est_max_nb=est_nb,
        est_rank_nb=est_rank,
        reason=reason,
        bin_blocks=bin_blocks,
        est_cost=float(cost),
        sigma=sigma,
    )
