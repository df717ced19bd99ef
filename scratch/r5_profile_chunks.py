"""Fill-wall attack prototype (host-only): greedy profile-matched
chunk formation.

The packed-binned fill = 128 * sum_{chunk,bin} max_{lane} cnt / nnz.
RCM order fills chunks with 128 *consecutive* rows; the loss vs the
"perfectly profile-matched" lower bound (1.76 on fem W2, PERF_NOTES
r5) is the per-bin count variance across a chunk's lanes.  Here:
slide a window of K chunks (128K consecutive RCM rows), assign rows
to chunks greedily (longest row first, chunk = argmin incremental
cost sum_b max(0, cnt_rb - width_cb)), keeping locality bounded to
the window.  Measures the raw objective + the true _binned_slots fill
of the resulting permutation.

Usage: python scratch/r5_profile_chunks.py data/fem_1m.mtx [W] [K]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tpu_spmv.formats.sell import LANES, _binned_slots
from tpu_spmv.reorder.rcm import rcm as rcm_fn
from tpu_spmv.tools.stats import load


def row_bins(mat, shift):
    """Per-row (bins, counts) in CSR-like arrays."""
    lens = mat.row_lengths.astype(np.int64)
    rows = np.repeat(np.arange(mat.m, dtype=np.int64), lens)
    bins = mat.indices.astype(np.int64) >> shift
    # collapse duplicate (row, bin) runs (columns ascend per row)
    change = np.empty(mat.nnz, dtype=bool)
    change[0] = True
    change[1:] = (rows[1:] != rows[:-1]) | (bins[1:] != bins[:-1])
    starts = np.flatnonzero(change)
    seg_rows = rows[starts]
    seg_bins = bins[starts]
    seg_cnt = np.diff(np.append(starts, mat.nnz))
    rptr = np.zeros(mat.m + 1, np.int64)
    np.add.at(rptr, seg_rows + 1, 1)
    np.cumsum(rptr, out=rptr)
    return rptr, seg_bins, seg_cnt


def objective(mat, shift):
    """sum_{chunk,bin} max_lane cnt * 128 / nnz (raw fill, no quanta)."""
    lens = mat.row_lengths.astype(np.int64)
    rows = np.repeat(np.arange(mat.m, dtype=np.int64), lens)
    chunks = rows >> 7
    bins = mat.indices.astype(np.int64) >> shift
    change = np.empty(mat.nnz, dtype=bool)
    change[0] = True
    change[1:] = (rows[1:] != rows[:-1]) | (bins[1:] != bins[:-1])
    starts = np.flatnonzero(change)
    seg_key = chunks[starts] * (1 << 40) + bins[starts]
    seg_cnt = np.diff(np.append(starts, mat.nnz))
    seg_lane = rows[starts]
    uk, inv = np.unique(seg_key, return_inverse=True)
    width = np.zeros(uk.size, np.int64)
    np.maximum.at(width, inv, seg_cnt)
    return width.sum() * LANES / mat.nnz


def greedy_perm(mat, shift, K):
    """Window-local greedy chunk assignment; returns row permutation."""
    rptr, seg_bins, seg_cnt = row_bins(mat, shift)
    m = mat.m
    perm = np.empty(m, np.int64)
    G = K * LANES
    t0 = time.time()
    for w0 in range(0, m, G):
        w1 = min(w0 + G, m)
        rows = np.arange(w0, w1)
        nch = -(-len(rows) // LANES)
        # local bin ids
        lo = seg_bins[rptr[w0]:rptr[w1]]
        ub = np.unique(lo)
        bmap = {b: i for i, b in enumerate(ub)}
        nb = len(ub)
        width = np.zeros((nch, nb), np.int64)
        occ = np.zeros(nch, np.int64)
        # longest rows first
        order = rows[np.argsort(-(rptr[rows + 1] - rptr[rows]),
                                kind="stable")]
        out = [[] for _ in range(nch)]
        for r in order:
            s, e = rptr[r], rptr[r + 1]
            rb = np.array([bmap[b] for b in seg_bins[s:e]], np.int64)
            rc = seg_cnt[s:e]
            wsub = width[:, rb]
            inc = np.maximum(rc[None, :] - wsub, 0).sum(axis=1)
            inc[occ >= LANES] = 1 << 40
            # Tie-breaks: prefer chunks already OVERLAPPING the row's
            # bins (avoids the all-ties -> chunk-0 pileup), then less
            # loaded ones (spreads seeds across empty chunks).
            overlap = (wsub > 0).sum(axis=1)
            score = inc * 1024.0 - overlap * 4.0 + occ * (4.0 / LANES)
            c = int(np.argmin(score))
            width[c, rb] = np.maximum(width[c, rb], rc)
            occ[c] += 1
            out[c].append(r)
        pos = w0
        for c in range(nch):
            for r in out[c]:
                perm[pos] = r
                pos += 1
    print(f"  greedy done in {time.time() - t0:.1f}s")
    return perm


def lex_perm(mat, shift, K):
    """Window-local lexicographic signature sort: rows keyed by their
    (bin ids, counts) tuple; identical-signature rows become adjacent
    and land in the same chunk."""
    rptr, seg_bins, seg_cnt = row_bins(mat, shift)
    m = mat.m
    perm = np.empty(m, np.int64)
    G = K * LANES
    for w0 in range(0, m, G):
        w1 = min(w0 + G, m)
        rows = np.arange(w0, w1)
        keys = [
            tuple(seg_bins[rptr[r]:rptr[r + 1]] * 16
                  + np.minimum(seg_cnt[rptr[r]:rptr[r + 1]], 15))
            for r in rows
        ]
        order = sorted(range(len(rows)), key=lambda i: keys[i])
        perm[w0:w1] = rows[np.array(order, np.int64)]
    return perm


def true_fill(mat, bin_blocks):
    _, kc = _binned_slots(mat, bin_blocks)
    return kc.sum() * LANES / mat.nnz


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "data/fem_1m.mtx"
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    shift = 7 + int(W).bit_length() - 1
    mat = load(path)
    work = mat.permuted(rcm_fn(mat.indptr, mat.indices))
    print(f"{path} m={mat.m} nnz={mat.nnz} W={W} K={K}")
    print(f"  RCM raw objective: {objective(work, shift):.3f}  "
          f"true fill: {true_fill(work, W):.3f}")
    perm = greedy_perm(work, shift, K)
    work2 = work.permuted(perm)
    print(f"  greedy raw objective: {objective(work2, shift):.3f}  "
          f"true fill: {true_fill(work2, W):.3f}")
    perm3 = lex_perm(work, shift, K)
    work3 = work.permuted(perm3)
    print(f"  lex raw objective: {objective(work3, shift):.3f}  "
          f"true fill: {true_fill(work3, W):.3f}")


if __name__ == "__main__":
    main()
