"""r5 chip batch 1: file-matrix packed variants + u8/bf16 A/B + k=2
confirmation. One process, serial over the relay. Usage:
  python scratch/r5_chip_batch1.py [fem|delaunay|road|all]
"""
import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

# Touch the device FIRST: the axon client init occasionally wedges
# forever on a transient tunnel glitch; printing the sentinel lets the
# retry wrapper (run_with_retry.sh) detect a healthy start.
print("INIT_OK", jax.devices(), flush=True)

from tpu_spmv.bench.harness import bench_spmv
from tpu_spmv.formats.packed import PackedRanked
from tpu_spmv.formats.sell import RankedSlabs
from tpu_spmv.kernels.packed import spmv_packed
from tpu_spmv.kernels.pallas_sell import spmv_ranked
from tpu_spmv.reorder import rcm as rcm_fn
from tpu_spmv.tools.stats import load

which = sys.argv[1] if len(sys.argv) > 1 else "all"


def bench(tag, mat, lay, fn, xj, ref):
    y = np.asarray(fn(lay, xj))
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    res = bench_spmv(fn, lay, xj)
    S = lay.num_subtiles
    rank = getattr(lay, "rank_nb", getattr(lay, "max_nb", "?"))
    lc = getattr(lay, "lcols", getattr(lay, "cols", lay.vals))
    print(f"[{tag}] S={S} fill={lay.padding_ratio:.2f} "
          f"rank={rank} lcols={lc.dtype} "
          f"vals={lay.vals.dtype}: {res.time_min*1e6:.1f} us  "
          f"{2*mat.nnz/res.time_min/1e9:.1f} GF/s  rel={rel:.1e}",
          flush=True)
    return res.time_min


def with_i16(lay):
    return dataclasses.replace(lay, lcols=lay.lcols.astype(jnp.int16))


def run_matrix(path, variants):
    mat = load(path)
    perm = rcm_fn(mat.indptr, mat.indices)
    work = mat.permuted(perm)
    x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
    xj = jnp.asarray(x[perm])
    ref = work.matvec(np.asarray(xj))
    print(f"== {path} m={mat.m} nnz={mat.nnz} ==", flush=True)
    for tag, build, fn in variants:
        try:
            lay = build(work)
        except ValueError as e:
            print(f"[{tag}] build failed: {e}", flush=True)
            continue
        bench(tag, mat, lay, fn, xj, ref)
    return mat, work, xj, ref


if which in ("fem", "all"):
    mat, work, xj, ref = run_matrix("data/fem_1m.mtx", [
        ("pk-W2-u8", lambda w: PackedRanked.from_csr(w, bin_blocks=2),
         spmv_packed),
        ("pk-W2-i16", lambda w: with_i16(
            PackedRanked.from_csr(w, bin_blocks=2)), spmv_packed),
        ("pk-W2-bf16-u8", lambda w: PackedRanked.from_csr(
            w, bin_blocks=2, val_dtype=jnp.bfloat16), spmv_packed),
        ("pk-W1-u8", lambda w: PackedRanked.from_csr(w, bin_blocks=1),
         spmv_packed),
    ])
    # k=2 srs=16 ordering confirmation (PARITY negative-result table):
    # same layout class, coarsened ordering, expect ~fill-proportional
    # slowdown vs the k=1 row above.
    from tpu_spmv.formats.csrk import CSRkMatrix

    ck = CSRkMatrix.build(work, k=2, sup_row_sizes=(16,))
    lay = PackedRanked.from_csr(ck.matrix, bin_blocks=2)
    xj2 = jnp.asarray(np.asarray(xj)[ck.perm])
    ref2 = ck.matrix.matvec(np.asarray(xj2))
    bench("pk-W2-u8 k=2 srs=16", mat, lay, spmv_packed, xj2, ref2)

if which in ("delaunay", "all"):
    run_matrix("data/delaunay_1m.mtx", [
        ("rk-W2 (r4b shipped)", lambda w: RankedSlabs.from_csr(
            w, bin_blocks=2), spmv_ranked),
        ("pk-W2-u8", lambda w: PackedRanked.from_csr(w, bin_blocks=2),
         spmv_packed),
        ("pk-W2-bf16-u8", lambda w: PackedRanked.from_csr(
            w, bin_blocks=2, val_dtype=jnp.bfloat16), spmv_packed),
    ])

if which in ("road", "all"):
    from tpu_spmv.formats.sell import SellSlabs
    from tpu_spmv.kernels.pallas_sell import spmv_sell

    run_matrix("data/road_2m.mtx", [
        # The r5 planner picks the plain sell kernel here (chunk span 3,
        # uniform kcq=1 heights -> reshape-sum epilogue): cost model
        # says ~47k units, never benched on road before.
        ("sell-ordinal", lambda w: SellSlabs.from_csr(w), spmv_sell),
        ("pk-aligned", lambda w: PackedRanked.from_csr(w), spmv_packed),
        ("pk-W2-u8", lambda w: PackedRanked.from_csr(w, bin_blocks=2),
         spmv_packed),
        ("pk-W4-u8", lambda w: PackedRanked.from_csr(w, bin_blocks=4),
         spmv_packed),
    ])

if which in ("fem3d", "all"):
    # fem3d_64 shipped DIA at 339 GF/s in natural order; confirm the
    # r5 planner still routes it there (no bench needed if plan says dia).
    from tpu_spmv.tune.model import tpu_plan

    mat = load("data/fem3d_64.mtx")
    plan = tpu_plan(mat)
    print(f"fem3d_64 plan: {plan.kernel} W={plan.bin_blocks} "
          f"rcm={plan.needs_rcm} ({plan.reason})", flush=True)
