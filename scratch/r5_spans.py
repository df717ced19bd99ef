"""Per-(sub-tile, sublane) ordinal span distributions + bucketed cost model.

For each matrix/ordering: build ordinal slot assignment, compute each
sub-tile's required pair count p = ceil(maxspan/2) where maxspan is the
max over its 8 sublanes of (hi_block - lo_block + 1), histogram the
sub-tiles by the class ceiling {1,2,4,8,16,32,...}, and model total time
with the calibrated v5e constants (3.68 ns/unit, fixed 4.47, pair 1.33).
Compare against the binned-W cost the planner picks today.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tpu_spmv.formats.sell import LANES, SUBLANES, sigma_sort
from tpu_spmv.tools.stats import load

UNIT = 3.68e-9
FIXED = 4.47
PAIR = 1.33


def subtile_spans(mat):
    """Per-sub-tile max sublane span (x blocks) + sub-tile count, ordinal."""
    m = mat.m
    lens = mat.row_lengths.astype(np.int64)
    num_chunks = -(-m // LANES)
    lpad = np.zeros(num_chunks * LANES, np.int64)
    lpad[:m] = lens
    kc_raw = lpad.reshape(num_chunks, LANES).max(axis=1)
    kc = np.maximum(-(-kc_raw // SUBLANES) * SUBLANES, SUBLANES)
    koff = np.zeros(num_chunks + 1, np.int64)
    np.cumsum(kc, out=koff[1:])
    rows = np.repeat(np.arange(m, dtype=np.int64), lens)
    ranks = np.arange(mat.nnz, dtype=np.int64) - np.repeat(
        mat.indptr[:-1].astype(np.int64), lens)
    dest_k = koff[rows // LANES] + ranks  # flat (subtile, sublane) = dest_k
    blocks = mat.indices.astype(np.int64) >> 7
    total_k = int(koff[-1])
    lo = np.full(total_k, np.iinfo(np.int64).max)
    hi = np.full(total_k, -1)
    np.minimum.at(lo, dest_k, blocks)
    np.maximum.at(hi, dest_k, blocks)
    span = np.where(hi >= 0, hi - np.where(lo == np.iinfo(np.int64).max, 0, lo) + 1, 1)
    S = total_k // SUBLANES
    sub_span = span.reshape(S, SUBLANES).max(axis=1)
    return sub_span


def model(sub_span, tag):
    pairs = np.maximum((sub_span + 1) // 2, 1)
    classes = [1, 2, 4, 8, 16, 32, 64, 128]
    print(f"  [{tag}] S={len(sub_span)}")
    tot = 0.0
    line = []
    for lo_i, c in enumerate(classes):
        lo_b = classes[lo_i - 1] if lo_i else 0
        n = int(((pairs > lo_b) & (pairs <= c)).sum())
        if n == 0:
            continue
        t = n * (FIXED + PAIR * c) * UNIT
        tot += t
        line.append(f"p<={c}: {n} ({t*1e6:.0f}us)")
    print("    " + "  ".join(line))
    print(f"    modeled bucketed total: {tot*1e6:.0f} us "
          f"-> {2*NNZ/tot/1e9:.0f} GF/s")
    # single-class comparison (all pay max)
    pmax = int(pairs.max())
    t1 = len(sub_span) * (FIXED + PAIR * pmax) * UNIT
    print(f"    single-class (pairs={pmax}): {t1*1e6:.0f} us")


def main():
    from tpu_spmv.reorder import rcm as rcm_fn

    global NNZ
    for path in sys.argv[1:]:
        mat = load(path)
        NNZ = mat.nnz
        perm = rcm_fn(mat.indptr, mat.indices)
        work = mat.permuted(perm)
        name = path.split("/")[-1].split(".")[0]
        print(f"== {name} nnz={mat.nnz}")
        model(subtile_spans(work), "rcm+ordinal")
        for sg in (512, 4096):
            s, _ = sigma_sort(work, sg)
            model(subtile_spans(s), f"rcm+sigma{sg}+ordinal")
        # sigma with secondary column key: sort by (len desc, first col)
        lens = work.row_lengths
        first = np.where(lens > 0, work.indices[np.minimum(
            work.indptr[:-1], work.nnz - 1)], 0)
        for sg in (4096,):
            permw = np.empty(work.m, np.int64)
            for w0 in range(0, work.m, sg):
                w1 = min(w0 + sg, work.m)
                order = np.lexsort((first[w0:w1], -lens[w0:w1]))
                permw[w0:w1] = w0 + order
            w2 = work.permuted_rows(permw) if hasattr(work, "permuted_rows") else None
            if w2 is None:
                # manual row-permute (columns unchanged)
                new_lens = lens[permw].astype(np.int64)
                indptr = np.zeros(work.m + 1, np.int64)
                np.cumsum(new_lens, out=indptr[1:])
                starts = work.indptr[permw].astype(np.int64)
                take = (np.arange(int(indptr[-1]), dtype=np.int64)
                        - np.repeat(indptr[:-1], new_lens)
                        + np.repeat(starts, new_lens))
                from tpu_spmv.formats.csr import CSRMatrix
                w2 = CSRMatrix(indptr.astype(np.int32), work.indices[take],
                               work.data[take], work.shape)
            model(subtile_spans(w2), f"rcm+lex{sg}(len,firstcol)+ordinal")


if __name__ == "__main__":
    main()
