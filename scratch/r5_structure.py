"""r5 structure analysis: where does the irregular-matrix fill go?

Host-only (NumPy + the layout builders' host halves). For each file
matrix after RCM, reports:
  - per-chunk ordinal span distribution (the plain sell loop count)
  - binned fill at W in {1,2,4,8}: quantized vs UNQUANTIZED slot sums
    (how much of the fill is the 8-sublane quantum)
  - aligned-slot fill + rank span
  - the same under a sigma row sort and under k=2 coarsen+RCM orderings
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tpu_spmv.formats.sell import LANES, SUBLANES, _binned_slots, _aligned_slots, sigma_sort
from tpu_spmv.tools.stats import load


def chunk_spans(mat):
    rows = np.repeat(np.arange(mat.m, dtype=np.int64), mat.row_lengths)
    chunks = rows // LANES
    blocks = mat.indices.astype(np.int64) >> 7
    nchunks = int(chunks.max()) + 1
    clo = np.full(nchunks, np.iinfo(np.int64).max)
    chi = np.full(nchunks, -1)
    np.minimum.at(clo, chunks, blocks)
    np.maximum.at(chi, chunks, blocks)
    used = chi >= 0
    return (chi[used] - clo[used] + 1)


def report(tag, mat):
    ideal_subs = -(-mat.nnz // (SUBLANES * LANES))
    sp = chunk_spans(mat)
    print(f"[{tag}] m={mat.m} nnz={mat.nnz} ideal_subs={ideal_subs}")
    print(f"  chunk span blocks: mean={sp.mean():.1f} p50={np.percentile(sp,50):.0f} "
          f"p90={np.percentile(sp,90):.0f} p99={np.percentile(sp,99):.0f} max={sp.max()}")
    # ordinal fill
    lens = np.zeros(-(-mat.m // LANES) * LANES, np.int64)
    lens[:mat.m] = mat.row_lengths
    kc_ord = lens.reshape(-1, LANES).max(axis=1)
    kq = np.maximum(-(-kc_ord // SUBLANES) * SUBLANES, SUBLANES)
    print(f"  ordinal: slots={kc_ord.sum()} q8={kq.sum()} "
          f"fill_raw={kc_ord.sum()*LANES/mat.nnz:.2f} fill_q8={kq.sum()*LANES/mat.nnz:.2f}")
    # aligned
    try:
        _, kc_ali = _aligned_slots(mat)
        kq = np.maximum(-(-kc_ali // SUBLANES) * SUBLANES, SUBLANES)
        from tpu_spmv.tune.model import exact_rank_nb
        _, rnb = exact_rank_nb(mat)
        print(f"  aligned: fill_raw={kc_ali.sum()*LANES/mat.nnz:.2f} "
              f"fill_q8={kq.sum()*LANES/mat.nnz:.2f} rank_nb={rnb}")
    except Exception as e:
        print(f"  aligned: failed {e}")
    for W in (1, 2, 4, 8):
        _, kc = _binned_slots(mat, W)
        kq = np.maximum(-(-kc // SUBLANES) * SUBLANES, SUBLANES)
        print(f"  binned W={W}: fill_raw={kc.sum()*LANES/mat.nnz:.2f} "
              f"fill_q8={kq.sum()*LANES/mat.nnz:.2f} subs_q8={kq.sum()//SUBLANES}")


def main():
    from tpu_spmv.reorder import rcm as rcm_fn

    for path in sys.argv[1:]:
        mat = load(path)
        perm = rcm_fn(mat.indptr, mat.indices)
        work = mat.permuted(perm)
        name = path.split("/")[-1].split(".")[0]
        report(name + "+rcm", work)

        s, _ = sigma_sort(work, 32 * LANES)
        report(name + "+rcm+sigma", s)

        # k=2: hand-coarsen + RCM on the coarse graph, composed.
        from tpu_spmv.formats.csrk import CSRkMatrix
        for srs in (8, 32, 128):
            ck = CSRkMatrix.build(mat, k=2, sup_row_sizes=(srs,))
            report(f"{name}+k2srs{srs}", ck.matrix)


if __name__ == "__main__":
    main()
