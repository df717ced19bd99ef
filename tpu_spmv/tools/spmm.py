"""SpMM benchmark CLI — Y = A @ X with B right-hand sides.

Net-new vs the reference (its drivers are single-vector SpMV only;
SURVEY.md §2.2): multi-vector products are the serving-shaped workload
on TPU, where the slab traffic amortizes across columns. Mirrors the
tools/spmv.py driver protocol — load, RCM, build the rank-windowed
layout, run the timed kernel, print `TimeMin/TimeMax/TimeAvg` and
validate each column against the serial oracle (spmv-csrk/spmv.cpp:
168-211's keys and tolerance).

Usage:
  python -m tpu_spmv.tools.spmm matrix.csr [num_runs] --batch 8 \
      [--kernel auto|resident|windowed] [--rcm auto|always|never]
"""

from __future__ import annotations

import argparse
import functools
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help=".csr/.csr3/.mtx file, or synthetic:<name>")
    ap.add_argument("num_runs", nargs="?", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8,
                    help="number of right-hand-side columns B")
    ap.add_argument(
        "--kernel", default="auto", choices=("auto", "resident", "windowed"),
        help="auto picks resident when the staged X fits the VMEM "
        "budget, else the HBM-windowed variant",
    )
    ap.add_argument("--rcm", default="auto", choices=("auto", "always", "never"))
    ap.add_argument("--tol", type=float, default=0.01)
    ap.add_argument("--val-dtype", default="f32", choices=("f32", "bf16"),
                    help="slab value storage dtype; bf16 halves the "
                    "per-column-amortized value traffic (validated against "
                    "the bf16-rounded operator, f32 drift reported)")
    ap.add_argument("--devices", type=int, default=1,
                    help=">1: row-shard A over a device mesh and run the "
                    "distributed SpMM (dist.spmm_sharded); 0 = all "
                    "available devices")
    ap.add_argument("--overlap", action="store_true",
                    help="with --devices: overlap the halo exchange "
                    "behind the main kernel (dist.OverlapRanked)")
    ap.add_argument("--validate-only", action="store_true")
    args = ap.parse_args(argv)

    from tpu_spmv.hw import interpret_mode

    interp = interpret_mode()  # pins a JAX_PLATFORMS=cpu request too

    import jax.numpy as jnp

    from tpu_spmv.formats.sell import RankedSlabs
    from tpu_spmv.kernels.spmm import spmm_ranked, spmm_ranked_windowed
    from tpu_spmv.tools.spmv import load_input
    from tpu_spmv.tune.model import tpu_plan

    mat = load_input(args.input)
    perm = None
    if args.rcm != "never" and mat.m == mat.n:
        apply_rcm = args.rcm == "always" or tpu_plan(mat).needs_rcm
        if apply_rcm:
            from tpu_spmv.reorder import rcm as rcm_fn

            perm = rcm_fn(mat.indptr, mat.indices)
            mat = mat.permuted(perm)
            print("RCM applied")

    B = args.batch
    vdt = jnp.bfloat16 if args.val_dtype == "bf16" else None
    if args.devices != 1:
        return _distributed(mat, args, B, vdt)
    # Plan-driven bin width: scattered structure exceeds the aligned
    # windows' packed-delta range (same fallback story as tools/spmv.py).
    plan = tpu_plan(mat, assume_rcm=perm is not None)
    # The packed layouts win on the irregular file classes (lower fill,
    # gather epilogue — ROUND5_SUMMARY item 1); honor the planner's
    # packed pick for the resident regime (spmm_packed, r5). Windowed
    # and explicit --kernel requests stay on the ranked path.
    if plan.kernel == "packed" and args.kernel == "auto":
        from tpu_spmv.formats.packed import PackedRanked
        from tpu_spmv.kernels.pallas_sell import resident_x_fits
        from tpu_spmv.kernels.spmm import spmm_packed

        try:
            p_lay = PackedRanked.from_csr(
                mat, bin_blocks=max(plan.bin_blocks, 0), val_dtype=vdt
            )
        except ValueError:
            p_lay = None  # packed-delta overflow: ranked fallback below
        if p_lay is not None and resident_x_fits(p_lay, batch=B):
            print(
                f"auto kernel: packed (plan; fill "
                f"{p_lay.padding_ratio:.2f}, staged X "
                f"{4 * mat.n * B / 2**20:.1f} MB)"
            )
            return _run_single(
                mat, args, B, vdt,
                functools.partial(spmm_packed, interpret=interp),
                p_lay,
            )
    try:
        layout = RankedSlabs.from_csr(
            mat, bin_blocks=plan.bin_blocks, val_dtype=vdt
        )
    except ValueError as e:
        raise SystemExit(
            f"ranked layout unavailable for this matrix ({e}); "
            "SpMM currently runs on the rank-windowed layout only"
        )
    kernel = args.kernel
    if kernel == "auto":
        from tpu_spmv.kernels.pallas_sell import resident_x_fits

        kernel = (
            "resident" if resident_x_fits(layout, batch=B) else "windowed"
        )
        print(
            f"auto kernel: {kernel} "
            f"(staged X {4 * mat.n * B / 2**20:.1f} MB)"
        )
        if kernel == "windowed" and layout.win_w <= 0:
            raise SystemExit(
                "X exceeds the VMEM budget but the layout has no "
                "per-tile windows (scattered structure); no SpMM path"
            )
    Bp = B
    if kernel == "windowed":
        # Column-chunking: the windowed kernel's double-buffered x
        # window scratch is 2 * win_w * B' * 128 * 4 bytes — on
        # weakly-banded matrices win_w can reach thousands of blocks
        # (road_2m: ~15k), and B'=8 then exceeds scoped VMEM (r5:
        # 122 MB vs the 16 MB limit, a hard Mosaic compile error).
        # Run ceil(B/B') passes at the largest B' whose scratch fits.
        win_bytes = 2 * max(layout.win_w, 1) * 128 * 4
        # Mosaic's scoped-VMEM limit is 16 MB; leave ~4 MB for the
        # double-buffered vals/lcols tiles and semaphores.
        budget = 12 * 2**20
        while Bp > 1 and win_bytes * Bp > budget:
            Bp = (Bp + 1) // 2
        if win_bytes * Bp > budget:
            raise SystemExit(
                f"no windowed SpMM path: the per-tile x window is "
                f"{layout.win_w} blocks ({win_bytes / 2**20:.0f} MB "
                f"double-buffered), beyond the VMEM scratch budget even "
                f"at one column per pass. Options: --devices N (row "
                f"sharding shrinks per-shard windows) or B columns of "
                f"single-vector spmv_packed/spmv_striped."
            )
        if Bp < B:
            print(f"windowed SpMM: column-chunked at B'={Bp} "
                  f"(window scratch {win_bytes * B / 2**20:.0f} MB at "
                  f"B={B} exceeds the VMEM scratch budget)")
        # The windowed kernel is locked to the layout's grid tile
        # (tile_b0 metadata); at the r4 padded-up 2048-sublane tiles a
        # B-scaled step count can spill into lax.fori_loop. Rebuild at
        # the largest unroll-safe tile cap for this B'.
        from tpu_spmv.kernels.pallas_sell import _UNROLL_BUDGET

        npairs = max((layout.rank_nb + 1) // 2, 1)
        inner = 2 * npairs * Bp
        cap = layout.tile_k
        while cap > 512 and (cap // 8) * inner > _UNROLL_BUDGET:
            cap //= 2
        if cap != layout.tile_k:
            print(f"rebuilding layout at tile {cap} for B'={Bp} "
                  "(unroll budget)")
            layout = RankedSlabs.from_csr(
                mat, bin_blocks=plan.bin_blocks, val_dtype=vdt,
                tile_k=cap,
            )
    if kernel == "resident":
        fn = functools.partial(spmm_ranked, interpret=interp)
    elif Bp == B:
        fn = functools.partial(spmm_ranked_windowed, interpret=interp)
    else:
        import jax.numpy as _jnp

        base = functools.partial(spmm_ranked_windowed, interpret=interp)

        def fn(lay, Xfull):
            return _jnp.concatenate(
                [base(lay, Xfull[:, i:i + Bp]) for i in range(0, B, Bp)],
                axis=1,
            )
    passes = -(-B // Bp)
    return _run_single(mat, args, B, vdt, fn, layout, passes=passes)


def _run_single(mat, args, B, vdt, fn, layout, passes=1):
    """Generate X, validate against the column-wise serial oracle,
    slope-bench, and report — shared by the ranked and packed paths.

    passes: how many times the slab traffic is actually streamed (the
    column-chunked windowed path re-reads the operator per B' chunk),
    so the roofline denominator amortizes over B/passes columns, not
    B."""
    import numpy as np
    import jax.numpy as jnp

    from tpu_spmv.bench.harness import bench_spmv, roofline_nnzs, validate

    rng = np.random.default_rng(0)
    X = rng.standard_normal((mat.n, B)).astype(np.float32)
    Xj = jnp.asarray(X)
    Y = np.asarray(fn(layout, Xj))
    mat_v = mat
    if vdt is not None:
        mat_v = mat.rounded(jnp.bfloat16)
        print("(bf16 values: validated vs the bf16-rounded operator)")
    Y_ref = np.stack([mat_v.matvec(X[:, b]) for b in range(B)], axis=1)
    # Shared magnitude-aware tolerance (bench.harness.validate): the
    # raw |delta| > tol absolute count trips on fp32 summation noise
    # for large-|y| matrices (the r4 fem_1m SpMV artifact, VERDICT r4
    # weak #1; this CLI had the same latent issue — the r5 fem_1m B=8
    # run read 34 "wrong" at rel-L2 8.5e-08).
    wrong, rel = validate(Y, Y_ref, tol=args.tol)
    if args.validate_only:
        print(f"Number Wrong: {wrong} ")
        print(f"RelL2: {rel:.3g}")
        return 0 if wrong == 0 else 1

    res = bench_spmv(
        fn, layout, Xj, reps_hi=8 + max(args.num_runs, 20),
        nnz=mat.nnz * B,  # one SpMM moves nnz*B FMAs
    )
    print(res.summary(), end="")
    # Per-nnz slab traffic amortizes over B/passes columns; x/y
    # traffic doesn't.
    bytes_per_val = layout.hbm_bytes * passes / max(mat.nnz, 1) / B
    roof = roofline_nnzs(bytes_per_val)
    print(
        f"vals/s: {res.gnnzs * 1e9:.4g} "
        f"({100 * res.gnnzs * 1e9 / roof:.0f}% of roofline) B={B}"
    )
    print(f"Number Wrong: {wrong} ")
    print(f"RelL2: {rel:.3g}")
    return 0 if wrong == 0 else 1


def _distributed(mat, args, B, vdt):
    """Row-sharded SpMM over all/requested devices — the distributed
    serving path (dist.spmm_sharded / dist.spmm_overlap), validated
    against the serial oracle like the single-chip mode."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_spmv.bench.harness import bench_spmv, validate
    from tpu_spmv.dist.sharding import (
        OverlapRanked, ShardedRanked, make_row_mesh, spmm_overlap,
        spmm_sharded,
    )

    avail = len(jax.devices())
    D = args.devices or avail
    if D > avail:
        raise SystemExit(f"requested {D} devices, only {avail} available")
    mesh = make_row_mesh(jax.devices()[:D])
    # Per-shard staged X budget (rows_per_shard + 2*halo rows in halo
    # mode, the full n under the all-gather fallback): beyond it the
    # shards run the HBM-windowed SpMM kernel (spmm_sharded kernel=
    # 'auto' resolves this; overlap stays resident-only, so fall back
    # to the non-overlapped windowed path there).
    from tpu_spmv.hw import device_spec

    lay = None
    if args.overlap and D > 1:
        try:
            lay = OverlapRanked.build(mat, D, val_dtype=vdt)
            local_n = (
                lay.rows_per_shard + 2 * lay.halo if lay.halo else mat.n
            )
            if 4 * local_n * B > device_spec().vmem_bytes // 2:
                print(
                    "staged X exceeds the VMEM budget; overlap is "
                    "resident-only — using windowed spmm_sharded"
                )
                lay = None
            else:
                fn = functools.partial(spmm_overlap, mesh=mesh)
                print(f"overlap split: edge nnz = {lay.edge.nnz}")
        except ValueError as e:
            print(f"overlap unavailable ({e}); using spmm_sharded")
    if lay is None:
        lay = ShardedRanked.build(mat, D, val_dtype=vdt)
        kern = args.kernel
        fn = functools.partial(spmm_sharded, mesh=mesh, kernel=kern)
        if kern != "auto":
            print(f"per-shard kernel: {kern}")
    lay = lay.device_put(mesh)
    print(f"devices={D} halo={lay.halo} rows/shard={lay.padded_m // D}")

    X = np.random.default_rng(0).standard_normal((mat.n, B)).astype(
        np.float32
    )
    Xp = np.zeros((lay.padded_m, B), np.float32)
    Xp[: mat.n] = X
    Xj = jax.device_put(
        jnp.asarray(Xp), NamedSharding(mesh, P("rows"))
    )
    Y = np.asarray(fn(lay, Xj))[: mat.m]
    mat_v = mat if vdt is None else mat.rounded(vdt)
    if vdt is not None:
        print("(bf16 values: validated vs the bf16-rounded operator)")
    Y_ref = np.stack([mat_v.matvec(X[:, b]) for b in range(B)], axis=1)
    # Magnitude-aware count, same rationale as the single-chip path.
    wrong, rel = validate(Y, Y_ref, tol=args.tol)
    if not args.validate_only:
        res = bench_spmv(
            fn, lay, Xj, reps_hi=8 + max(args.num_runs, 20),
            nnz=mat.nnz * B,
        )
        print(res.summary(), end="")
        print(f"vals/s: {res.gnnzs * 1e9:.4g} B={B} D={D}")
    print(f"Number Wrong: {wrong} ")
    print(f"RelL2: {rel:.3g}")
    return 0 if wrong == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
