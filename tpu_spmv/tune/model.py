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
    kernel: str  # 'ranked' | 'sell' | 'segsum'
    tile_k: int
    needs_rcm: bool
    est_max_nb: float  # per-chunk span estimate (plain-kernel loop count)
    est_rank_nb: float  # per-rank span estimate (ranked-kernel loop count)
    reason: str


# The SELL kernel gathers x block-by-block; beyond this span per chunk
# the unrolled gather loop's compute exceeds any streaming win over the
# XLA fallback, and the x window no longer fits cache-like reuse.
_SPAN_LIMIT = 96
# Measured on v5e (docs/PERF_NOTES.md): a ranked-kernel gather iteration
# costs ~1.4x a plain-kernel iteration since the paired (2,128) window
# loads (it was ~3.5x with per-block loads), so rank windows pay once
# they shrink the loop by more than this factor (margin included).
_RANKED_ITER_COST = 1.6


def exact_rank_nb(mat, align: bool = True) -> tuple[int, int]:
    """(chunk span, per-slot span) in x blocks, exact, O(nnz) NumPy.

    chunk span drives the plain SELL kernel's gather loop; per-slot span
    drives the rank-windowed kernel's. align=True measures the
    cluster-aligned slot assignment RankedSlabs actually builds
    (formats/sell._aligned_slots); False measures ordinal ranks.
    """
    from tpu_spmv.formats.sell import LANES, _aligned_slots

    m = mat.m
    lens = mat.row_lengths.astype(np.int64)
    if mat.nnz == 0 or m == 0:
        return 1, 1
    rows = np.repeat(np.arange(m, dtype=np.int64), lens)
    if align:
        ranks, kc_raw = _aligned_slots(mat)
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


def tpu_plan(mat, assume_rcm: bool = False, exact: bool = True) -> TpuPlan:
    """Choose kernel + layout parameters from matrix structure.

    mat: CSRMatrix (ideally already RCM'd; set assume_rcm if so).
    exact=True measures the real spans (O(nnz)); False estimates from
    band percentiles only.
    """
    from tpu_spmv.formats.sell import LANES

    m = mat.m
    bands = mat.row_bands()
    est_span_cols = float(np.percentile(bands, 95)) + LANES if m else 1.0
    est_nb = est_span_cols / LANES
    est_rank = est_nb
    if exact and mat.nnz and int(mat.row_lengths.max()) <= 2048:
        chunk_nb, rank_nb = exact_rank_nb(mat)
        est_nb, est_rank = float(chunk_nb), float(rank_nb)
    needs_rcm = not assume_rcm and est_nb > 8 and m > LANES

    if est_nb > _SPAN_LIMIT and est_rank * _RANKED_ITER_COST > _SPAN_LIMIT:
        kernel, reason = "segsum", (
            f"chunk span ~{est_nb:.0f} blocks exceeds {_SPAN_LIMIT} and rank "
            f"windows ({est_rank:.0f}) are no cheaper; XLA segment-sum"
        )
    elif est_nb > _RANKED_ITER_COST * est_rank and est_rank <= 250:
        kernel, reason = "ranked", (
            f"rank span {est_rank:.0f} vs chunk span {est_nb:.0f} blocks; "
            f"per-sublane windows win (> {_RANKED_ITER_COST}x loop cut)"
        )
    else:
        kernel, reason = "sell", (
            f"chunk span {est_nb:.0f} vs rank span {est_rank:.0f} blocks; "
            "plain gather loop is cheapest"
        )
    return TpuPlan(
        kernel=kernel,
        tile_k=512,
        needs_rcm=needs_rcm,
        est_max_nb=est_nb,
        est_rank_nb=est_rank,
        reason=reason,
    )
