"""Round benchmark: flagship Pallas SELL SpMV vs the pure-XLA baseline.

Prints ONE JSON line:
  metric: spmv_gflops — flagship kernel GFLOP/s (2*nnz/TimeMin) on a
          reference-class matrix (1M-row 5-point Laplacian, the
          ecology1/G3_circuit/thermal2 family; RCM'd like the
          reference pipeline's converter.m).
  vs_baseline: speedup over the in-repo segment-sum baseline, which
          stands in for the reference's vendor-library baselines
          (MKL/cuSPARSE role; no absolute numbers exist in-tree,
          BASELINE.md).
Timing uses the slope protocol (tpu_spmv/bench/harness.py) — the
reference's naive per-call protocol is invalid through this TPU tunnel.
"""

import functools
import json
import os
import sys

import numpy as np


def main():
    import jax.numpy as jnp

    from tpu_spmv.bench.harness import bench_spmv, roofline_nnzs, validate
    from tpu_spmv.bench.matrices import laplacian_2d
    from tpu_spmv.formats.sell import RankedSlabs, SellSlabs
    from tpu_spmv.kernels.pallas_sell import spmv_ranked, spmv_sell
    from tpu_spmv.kernels.segsum import SegsumLayout, spmv_segsum
    from tpu_spmv.reorder.rcm import rcm
    from tpu_spmv.tune.model import tpu_plan

    # TPU_SPMV_BENCH_N: grid side (default 1024 = the 1.05M-row flagship);
    # smaller values + the CPU backend give an end-to-end smoke test of
    # this exact script (kernels run in interpret mode there).
    N = int(os.environ.get("TPU_SPMV_BENCH_N", "1024"))
    from tpu_spmv.hw import interpret_mode

    interp = interpret_mode()  # also pins a JAX_PLATFORMS=cpu request
    # CPU smoke runs can't afford 1050 interpret-mode reps.
    reps = dict(reps_lo=2, reps_hi=6, samples=2) if interp else dict(
        reps_lo=50, reps_hi=1050, samples=4
    )
    mat_raw = laplacian_2d(N)  # N=1024: 1.05M rows, 5.2M nnz
    mat = mat_raw
    perm = None
    try:
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        perm = np.asarray(reverse_cuthill_mckee(mat.to_scipy(), symmetric_mode=True))
    except Exception:
        perm = rcm(mat.indptr, mat.indices)
    mat = mat.permuted(perm)

    x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
    xj = jnp.asarray(x)
    y_oracle = mat.matvec(x)

    plan = tpu_plan(mat, assume_rcm=True)
    if plan.kernel in ("ranked", "packed"):
        try:
            if plan.kernel == "packed":
                from tpu_spmv.formats.packed import PackedRanked
                from tpu_spmv.kernels.packed import spmv_packed as _spk

                layout = PackedRanked.from_csr(
                    mat, bin_blocks=max(plan.bin_blocks, 0)
                )
                fn = functools.partial(_spk, interpret=interp)
            else:
                layout = RankedSlabs.from_csr(mat, bin_blocks=plan.bin_blocks)
                fn = functools.partial(spmv_ranked, interpret=interp)
        except ValueError:
            # Packed-delta span exceeded (the plan estimates rank on a
            # sampled sub-matrix, so a global outlier can slip past it,
            # ADVICE r2): same sell fallback as tools/spmv.py.
            layout = SellSlabs.from_csr(mat)
            fn = functools.partial(spmv_sell, interpret=interp)
    else:
        layout = SellSlabs.from_csr(mat)
        fn = functools.partial(spmv_sell, interpret=interp)
    y = np.asarray(fn(layout, xj))
    wrong, rel = validate(y, y_oracle)
    # One large reps differential upfront: skips the escalation ladder's
    # recompiles and keeps the slope well above the fetch-quantum jitter.
    flag = bench_spmv(fn, layout, xj, **reps)
    kernel_name = plan.kernel

    # Candidate deadline: each head-to-head candidate costs a remote
    # Pallas compile (~30-40s when the relay is healthy, sometimes
    # minutes). The flagship number above is already in hand — stop
    # starting new candidates once the budget is spent so a slow relay
    # degrades to fewer candidates instead of a timeout with NO output.
    import time as _time

    _deadline = _time.monotonic() + float(
        os.environ.get("TPU_SPMV_BENCH_BUDGET_S", "1200")
    )

    def _time_left(name):
        if _time.monotonic() < _deadline:
            return True
        print(f"# {name} candidate skipped: bench budget spent",
              file=sys.stderr)
        return False

    # Packed mixed-height candidate (VERDICT r2 next #3): same rank
    # windows, no 8-sublane slab quantum — on ~5 nnz/row matrices the
    # quantum IS the 1.60x padding. Measured head-to-head; any failure
    # (build, Mosaic compile, validation) keeps the proven kernel.
    try:
        if kernel_name == "packed":
            raise RuntimeError("flagship already packed (planner choice)")
        if not _time_left("packed"):
            raise TimeoutError("bench budget")
        from tpu_spmv.formats.packed import PackedRanked
        from tpu_spmv.kernels.packed import spmv_packed

        pk = PackedRanked.from_csr(mat, bin_blocks=max(plan.bin_blocks, 0))
        spmv_packed = functools.partial(spmv_packed, interpret=interp)
        y_p = np.asarray(spmv_packed(pk, xj))
        w_p, r_p = validate(y_p, y_oracle)
        if w_p == 0:
            p_res = bench_spmv(spmv_packed, pk, xj, **reps)
            print(
                f"# packed candidate: {p_res.gflops:.1f} GFLOP/s "
                f"pad={pk.padding_ratio:.2f} (vs {flag.gflops:.1f})",
                file=sys.stderr,
            )
            if p_res.time_min < flag.time_min:
                flag, layout, wrong, rel = p_res, pk, w_p, r_p
                kernel_name = "packed"
    except Exception as e:  # pragma: no cover - chip-dependent
        print(f"# packed candidate unavailable: {e!r}", file=sys.stderr)

    # bf16 value-storage candidate (r3): halves the dominant slab-value
    # traffic of a kernel measured memory-bound at >90% of its layout
    # roofline. Promoted to flagship ONLY when bit-exact headroom exists
    # (rel < 1e-6 vs the f32 oracle — true for the Laplacian's +-1/4
    # values, which bf16 represents exactly); otherwise it is reported
    # as a separate datum so the flagship metric keeps f32 numerics.
    try:
        if kernel_name in ("ranked", "packed") and _time_left("bf16"):
            if kernel_name == "packed":
                from tpu_spmv.formats.packed import PackedRanked
                from tpu_spmv.kernels.packed import spmv_packed as _pf

                bf_lay = PackedRanked.from_csr(
                    mat, val_dtype=jnp.bfloat16,
                    bin_blocks=max(plan.bin_blocks, 0),
                )
                bf_fn = functools.partial(_pf, interpret=interp)
            else:
                bf_lay = RankedSlabs.from_csr(
                    mat, bin_blocks=plan.bin_blocks, val_dtype=jnp.bfloat16
                )
                bf_fn = functools.partial(spmv_ranked, interpret=interp)
            y_b = np.asarray(bf_fn(bf_lay, xj))
            w_b, r_b = validate(y_b, y_oracle)
            b_res = bench_spmv(bf_fn, bf_lay, xj, **reps)
            print(
                f"# bf16-vals candidate [{kernel_name}]: "
                f"{b_res.gflops:.1f} GFLOP/s wrong={w_b} relL2={r_b:.1e} "
                f"(vs {flag.gflops:.1f} f32)",
                file=sys.stderr,
            )
            if w_b == 0 and r_b < 1e-6 and b_res.time_min < flag.time_min:
                flag, layout, wrong, rel = b_res, bf_lay, w_b, r_b
                kernel_name = f"{kernel_name}+bf16"
    except Exception as e:  # pragma: no cover - chip-dependent
        print(f"# bf16 candidate unavailable: {e!r}", file=sys.stderr)

    # DIA candidate on the NATURAL ordering (structure detection, r3):
    # a 5-point grid has constant diagonals before RCM — fill 1.00x,
    # zero index traffic, no gather. The reference pipeline always RCMs
    # because its CPU kernel needs the band; the TPU framework detects
    # the stencil and skips the reorder that would destroy it.
    try:
        plan_raw = tpu_plan(mat_raw, assume_rcm=False)
        if plan_raw.kernel == "dia" and _time_left("dia"):
            from tpu_spmv.formats.dia import DiaSlabs
            from tpu_spmv.kernels.dia import spmv_dia

            dl = DiaSlabs.from_csr(mat_raw)
            spmv_dia = functools.partial(spmv_dia, interpret=interp)
            x_raw = np.random.default_rng(2).standard_normal(
                mat_raw.n
            ).astype(np.float32)
            xj_raw = jnp.asarray(x_raw)
            y_d = np.asarray(spmv_dia(dl, xj_raw))
            y_raw_oracle = mat_raw.matvec(x_raw)
            w_d, r_d = validate(y_d, y_raw_oracle)
            if w_d == 0:
                d_res = bench_spmv(spmv_dia, dl, xj_raw, **reps)
                print(
                    f"# dia candidate (natural order): "
                    f"{d_res.gflops:.1f} GFLOP/s "
                    f"({dl.num_diagonals} diagonals, "
                    f"fill {dl.padding_ratio:.2f}) vs {flag.gflops:.1f}",
                    file=sys.stderr,
                )
                if d_res.time_min < flag.time_min:
                    flag, layout, wrong, rel = d_res, dl, w_d, r_d
                    kernel_name = "dia"
                # DIA traffic is almost entirely values: bf16 nearly
                # halves it. Promoted only when exact vs the f32 oracle
                # (the Laplacian's +-1/4 are bf16-representable). A
                # spent budget here skips ONLY this sub-candidate (the
                # f32 dia above already ran and may have been promoted).
                dlb = None
                if _time_left("dia+bf16"):
                    dlb = DiaSlabs.from_csr(mat_raw, val_dtype=jnp.bfloat16)
                if dlb is not None:
                    y_db = np.asarray(spmv_dia(dlb, xj_raw))
                    w_db, r_db = validate(y_db, y_raw_oracle)
                    db_res = bench_spmv(spmv_dia, dlb, xj_raw, **reps)
                    print(
                        f"# dia+bf16 candidate: {db_res.gflops:.1f} "
                        f"GFLOP/s wrong={w_db} relL2={r_db:.1e}",
                        file=sys.stderr,
                    )
                    if (w_db == 0 and r_db < 1e-6
                            and db_res.time_min < flag.time_min):
                        flag, layout, wrong, rel = db_res, dlb, w_db, r_db
                        kernel_name = "dia+bf16"
    except Exception as e:  # pragma: no cover - chip-dependent
        print(f"# dia candidate unavailable: {e!r}", file=sys.stderr)

    seg = SegsumLayout.from_csr(mat)
    base = bench_spmv(spmv_segsum, seg, xj, reps_lo=2, reps_hi=10)

    roof = roofline_nnzs(layout.hbm_bytes / max(mat.nnz, 1))
    # Ideal-CSR roofline (BASELINE.md): ~8 B/nnz (val+col), padding-free.
    roof_ideal = roofline_nnzs(8.0)
    print(
        f"# flagship [{kernel_name}]: {flag.gflops:.1f} GFLOP/s "
        f"({flag.gnnzs:.1f} Gnnz/s, "
        f"{100 * flag.gnnzs * 1e9 / roof:.0f}% layout roofline, "
        f"{100 * flag.gnnzs * 1e9 / roof_ideal:.0f}% ideal-CSR roofline) | "
        f"baseline segsum: {base.gflops:.2f} GFLOP/s | "
        f"wrong={wrong} relL2={rel:.1e} pad={layout.padding_ratio:.2f}",
        file=sys.stderr,
    )
    assert wrong == 0, f"validation failed: {wrong} elements beyond tolerance"
    print(
        json.dumps(
            {
                "metric": "spmv_gflops",
                "value": round(flag.gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(flag.time_min and base.time_min / flag.time_min, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
