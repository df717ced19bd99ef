"""On-chip cost-model calibration — the reference's per-arch tuning role.

The reference ships hand-fit per-architecture constants inside its
binaries (spmv-auto-volta.cu:132-158, -ampere.cu:130-158,
-mi100.cu:132-133, csr3params.m); this tool re-measures the TPU cost
model on whatever chip the process sees and writes the result to the
calibration file `hw.kernel_calibration` overlays onto
`tune.tpu_plan`'s v5e defaults — so a v4/v6e/future deployment
self-tunes instead of inheriting v5e numbers (VERDICT r2 weak #5).

Protocol (the r2 bin-width sweep, docs/PERF_NOTES.md, as a tool):
  1. plain-iteration unit: SELL kernel on a banded sample — per
     sub-tile time / chunk span (max_nb).
  2. ranked sub-tile cost: binned RankedSlabs on a scattered sample at
     several bin widths W; each W fixes the static gather-loop pair
     count, so (pairs, time/sub-tile/unit) points fit
     t = ranked_fixed + pair_cost * pairs by least squares.

Usage:
  python -m tpu_spmv.tools.tune --calibrate            # measure + write
  python -m tpu_spmv.tools.tune --calibrate --dry-run  # measure + print
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def fit_affine(points) -> tuple[float, float]:
    """Least-squares (a, b) for t = a + b*p over (p, t) points."""
    pts = np.asarray(points, dtype=np.float64)
    if pts.shape[0] < 2:
        raise ValueError("need >= 2 (pairs, time) points to fit")
    A = np.stack([np.ones(pts.shape[0]), pts[:, 0]], axis=1)
    (a, b), *_ = np.linalg.lstsq(A, pts[:, 1], rcond=None)
    return float(a), float(b)


def calib_path() -> str:
    return os.environ.get(
        "TPU_SPMV_CALIB",
        os.path.expanduser("~/.cache/tpu_spmv/calib.json"),
    )


def measure(scale: float = 1.0, interp: bool = False) -> dict:
    """Run the calibration protocol; returns the constants dict.

    scale < 1 shrinks the samples (CPU smoke of the exact flow).
    """
    import functools

    import jax.numpy as jnp

    from tpu_spmv.bench.harness import bench_spmv
    from tpu_spmv.bench.matrices import random_banded, random_general
    from tpu_spmv.formats.sell import SUBLANES, RankedSlabs, SellSlabs
    from tpu_spmv.kernels.pallas_sell import spmv_ranked, spmv_sell
    from tpu_spmv.reorder import rcm as rcm_fn

    reps = (
        dict(reps_lo=2, reps_hi=6, samples=2, _depth=4) if interp
        else dict(reps_lo=50, reps_hi=1050, samples=3)
    )

    # 1. Plain-iteration unit from a wide-band SELL run (span >> fixed
    # cost, so t/sub-tile ~= max_nb * unit).
    mb = random_banded(int(65536 * scale), int(2048 * scale) + 64, 12, seed=0)
    mb = mb.permuted(rcm_fn(mb.indptr, mb.indices))
    sl = SellSlabs.from_csr(mb)
    xb = jnp.asarray(
        np.random.default_rng(0).standard_normal(mb.n).astype(np.float32)
    )
    rb = bench_spmv(
        functools.partial(spmv_sell, interpret=interp), sl, xb, **reps
    )
    s_sell = int(sl.vals.shape[0]) // SUBLANES
    unit = rb.time_min / (s_sell * max(sl.max_nb, 1))
    print(
        f"# unit: {unit * 1e9:.3f} ns/plain-iter "
        f"(span {sl.max_nb}, {s_sell} sub-tiles)",
        file=sys.stderr,
    )

    # 2. Ranked sub-tile cost across bin widths on scattered structure.
    mg = random_general(int(50_000 * scale), 8, seed=2)
    xg = jnp.asarray(
        np.random.default_rng(1).standard_normal(mg.n).astype(np.float32)
    )
    pts = []
    for w in (2, 4, 8, 16):
        try:
            lay = RankedSlabs.from_csr(mg, bin_blocks=w)
        except ValueError as e:
            print(f"# W={w}: skipped ({e})", file=sys.stderr)
            continue
        r = bench_spmv(
            functools.partial(spmv_ranked, interpret=interp), lay, xg, **reps
        )
        s = int(lay.vals.shape[0]) // SUBLANES
        pairs = max((lay.rank_nb + 1) // 2, 1)
        t_units = r.time_min / s / unit
        pts.append((pairs, t_units))
        print(
            f"# W={w}: rank_nb={lay.rank_nb} pairs={pairs} "
            f"{t_units:.2f} units/sub-tile ({s} sub-tiles)",
            file=sys.stderr,
        )
    fixed, pair = fit_affine(pts)

    # 3. Packed surcharge (tune.model _PACKED_OVER): a NARROW-band
    # sample (rank_nb ~2, where the surcharge dominates the sub-tile
    # cost; on wide-rank samples it drowns in pair steps) through
    # PackedRanked vs quantized RankedSlabs — same aligned windows,
    # same rank, so the per-sub-tile delta IS the segmented-reduce +
    # epilogue premium the planner charges the packed candidate.
    packed_over = None
    try:
        from tpu_spmv.formats.packed import PackedRanked
        from tpu_spmv.kernels.packed import spmv_packed

        mn = random_banded(int(262144 * scale), 96, 5, seed=4)
        mn = mn.permuted(rcm_fn(mn.indptr, mn.indices))
        xn = jnp.asarray(
            np.random.default_rng(2).standard_normal(mn.n).astype(
                np.float32
            )
        )
        rl = RankedSlabs.from_csr(mn)
        rr = bench_spmv(
            functools.partial(spmv_ranked, interpret=interp), rl, xn, **reps
        )
        ru = rr.time_min / (int(rl.vals.shape[0]) // SUBLANES) / unit
        pk = PackedRanked.from_csr(mn)
        rp = bench_spmv(
            functools.partial(spmv_packed, interpret=interp), pk, xn, **reps
        )
        pu = rp.time_min / (int(pk.vals.shape[0]) // SUBLANES) / unit
        packed_over = max(pu - ru, 0.1)
        print(
            f"# packed: {pu:.2f} units/sub-tile vs ranked {ru:.2f} "
            f"-> packed_over={packed_over:.2f}",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover - chip-dependent
        print(f"# packed_over: skipped ({e})", file=sys.stderr)

    out = {
        "ranked_fixed": round(max(fixed, 0.1), 3),
        "pair_cost": round(max(pair, 0.05), 3),
        # Pair serves 2 gather iterations; express the per-iteration
        # premium over a plain iteration (floor 1: a gather iteration
        # cannot be cheaper than the plain block loop).
        "ranked_iter_cost": round(max(pair / 2 * 2.0, 1.0), 3),
    }
    if packed_over is not None:
        out["packed_over"] = round(packed_over, 3)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--calibrate", action="store_true", required=True)
    ap.add_argument("--dry-run", action="store_true",
                    help="measure and print; do not write the file")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="sample-size factor (CPU smoke: 0.02)")
    args = ap.parse_args(argv)

    from tpu_spmv.hw import device_spec, interpret_mode

    interp = interpret_mode()
    consts = measure(scale=args.scale, interp=interp)
    kind = device_spec().kind
    print(json.dumps({kind: consts}))
    if args.dry_run:
        return 0
    path = calib_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    table = {}
    try:
        with open(path) as f:
            table = json.load(f)
    except (OSError, ValueError):
        pass
    table[kind] = consts
    with open(path, "w") as f:
        json.dump(table, f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
