"""r4 contradiction repro: measure the three r3 anomalies at HEAD.

VERDICT r3 weak #1/#2/#5:
  (a) general_500k auto: r2 6.35ms vs r3 16.2ms (same plan) — which is true now?
  (b) banded_1m auto: 32 GF/s vs ~65 modeled; packed slower than ranked there.
  (c) lap2d_1024 packed: 124 GF/s (bench.py, scipy RCM) vs 27 (sweep, native RCM).

Each config is timed with BOTH protocols (sweep default reps and bench.py's
big reps) and, for (c), BOTH permutations — isolating protocol vs perm vs code.
Run on the real chip: python scratch/repro_r4.py
"""
import functools
import sys

import numpy as np

import jax.numpy as jnp

from tpu_spmv.bench.harness import bench_spmv, validate
from tpu_spmv.bench import matrices as M
from tpu_spmv.formats.sell import RankedSlabs, SellSlabs
from tpu_spmv.kernels.pallas_sell import spmv_ranked, spmv_sell
from tpu_spmv.reorder import rcm as rcm_native
from tpu_spmv.tune.model import tpu_plan

BIG = dict(reps_lo=50, reps_hi=1050, samples=4)


def run(tag, fn, lay, xj, y_ref, vperm):
    y = np.asarray(fn(lay, xj))
    wrong, rel = validate(y, y_ref[vperm] if vperm is not None else y_ref)
    r_small = bench_spmv(fn, lay, xj)
    r_big = bench_spmv(fn, lay, xj, **BIG)
    print(
        f"{tag}: sweep-protocol {r_small.gflops:.2f} GF/s "
        f"(tmin {r_small.time_min:.3e}, iters {r_small.iters}) | "
        f"bench-protocol {r_big.gflops:.2f} GF/s (tmin {r_big.time_min:.3e}) "
        f"| wrong={wrong} relL2={rel:.1e} pad={lay.padding_ratio:.3f}",
        flush=True,
    )


def build_auto(mat, assume_rcm=True):
    plan = tpu_plan(mat, assume_rcm=assume_rcm)
    print(f"  plan: kernel={plan.kernel} W={plan.bin_blocks} sigma={plan.sigma} "
          f"est_cost={plan.est_cost:.3g} reason={plan.reason}", flush=True)
    if plan.kernel == "ranked":
        lay = RankedSlabs.from_csr(mat, bin_blocks=plan.bin_blocks)
        fn = spmv_ranked
    elif plan.kernel == "sell":
        lay = SellSlabs.from_csr(mat, bin_blocks=plan.bin_blocks)
        fn = spmv_sell
    else:
        raise SystemExit(f"unexpected plan {plan.kernel}")
    return fn, lay, plan


def main():
    which = set(sys.argv[1:]) or {"general", "banded", "lap2d"}

    if "general" in which:
        mat = M.random_general(500_000, 10, seed=2)
        mat = mat.permuted(rcm_native(mat.indptr, mat.indices))
        x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
        xj = jnp.asarray(x)
        y_ref = mat.matvec(x)
        print("== general_500k (native RCM, sweep path) ==", flush=True)
        fn, lay, plan = build_auto(mat)
        run("general_500k auto", fn, lay, xj, y_ref, None)

    if "banded" in which:
        mat = M.random_banded(1_000_000, 1000, 16, seed=1)
        mat = mat.permuted(rcm_native(mat.indptr, mat.indices))
        x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
        xj = jnp.asarray(x)
        y_ref = mat.matvec(x)
        print("== banded_1m (native RCM) ==", flush=True)
        fn, lay, plan = build_auto(mat)
        run("banded_1m auto", fn, lay, xj, y_ref, None)
        from tpu_spmv.formats.packed import PackedRanked
        from tpu_spmv.kernels.packed import spmv_packed

        pk = PackedRanked.from_csr(mat)
        run("banded_1m packed", spmv_packed, pk, xj, y_ref, None)

    if "lap2d" in which:
        from tpu_spmv.formats.packed import PackedRanked
        from tpu_spmv.kernels.packed import spmv_packed

        raw = M.laplacian_2d(1024)
        x = np.random.default_rng(0).standard_normal(raw.n).astype(np.float32)
        xj = jnp.asarray(x)
        for label, perm in (
            ("native-RCM", rcm_native(raw.indptr, raw.indices)),
            ("scipy-RCM", None),
        ):
            if perm is None:
                from scipy.sparse.csgraph import reverse_cuthill_mckee

                perm = np.asarray(
                    reverse_cuthill_mckee(raw.to_scipy(), symmetric_mode=True)
                )
            mat = raw.permuted(perm)
            y_ref = mat.matvec(x)
            print(f"== lap2d_1024 packed ({label}) ==", flush=True)
            pk = PackedRanked.from_csr(mat)
            print(f"  rank_nb={pk.rank_nb} tile_k={pk.tile_k} "
                  f"group_code={getattr(pk, 'group_code', None)}", flush=True)
            run(f"lap2d packed {label}", spmv_packed, pk, xj, y_ref, None)
            fn, lay, plan = build_auto(mat)
            run(f"lap2d auto {label}", fn, lay, xj, y_ref, None)


if __name__ == "__main__":
    main()
