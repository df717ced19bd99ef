"""r4 kernel-change measurements: paired (16,128) slab loads, dia
single-roll, planner packed candidate.

Prints one line per config. Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scratch/measure_r4_kernels.py
"""
import functools
import sys

import numpy as np
import jax.numpy as jnp

from tpu_spmv.bench.harness import bench_spmv, validate
from tpu_spmv.bench import matrices as M
from tpu_spmv.formats.dia import DiaSlabs
from tpu_spmv.formats.packed import PackedRanked
from tpu_spmv.formats.sell import RankedSlabs
from tpu_spmv.kernels.dia import spmv_dia
from tpu_spmv.kernels.packed import spmv_packed
from tpu_spmv.kernels.pallas_sell import spmv_ranked
from tpu_spmv.reorder import rcm

BIG = dict(reps_lo=50, reps_hi=1050, samples=4)


def run(tag, fn, lay, xj, y_ref, tol_rel=1e-6):
    y = np.asarray(fn(lay, xj))
    wrong, rel = validate(y, y_ref)
    r = bench_spmv(fn, lay, xj, **BIG)
    print(
        f"{tag}: {r.gflops:.2f} GF/s tmin={r.time_min:.4e} "
        f"wrong={wrong} relL2={rel:.1e} pad={lay.padding_ratio:.3f}",
        flush=True,
    )
    return r


def main():
    which = set(sys.argv[1:]) or {"lap2d", "dia", "varstencil"}

    if "lap2d" in which or "dia" in which:
        raw = M.laplacian_2d(1024)
        x = np.random.default_rng(0).standard_normal(raw.n).astype(np.float32)
        xj = jnp.asarray(x)

    if "lap2d" in which:
        mat = raw.permuted(rcm(raw.indptr, raw.indices))
        y_ref = mat.matvec(x)
        print("== lap2d_1024 paired-load slab kernels (native RCM) ==",
              flush=True)
        run("ranked f32", spmv_ranked, RankedSlabs.from_csr(mat), xj, y_ref)
        run("ranked bf16", spmv_ranked,
            RankedSlabs.from_csr(mat, val_dtype=jnp.bfloat16), xj, y_ref)
        run("packed f32", spmv_packed, PackedRanked.from_csr(mat), xj, y_ref)
        run("packed bf16", spmv_packed,
            PackedRanked.from_csr(mat, val_dtype=jnp.bfloat16), xj, y_ref)

    if "dia" in which:
        y_raw = raw.matvec(x)
        print("== lap2d_1024 dia single-roll (natural order) ==", flush=True)
        run("dia f32", spmv_dia, DiaSlabs.from_csr(raw), xj, y_raw)
        run("dia bf16", spmv_dia,
            DiaSlabs.from_csr(raw, val_dtype=jnp.bfloat16), xj, y_raw)

    if "varstencil" in which:
        vs = M.variable_stencil(1024, seed=4)
        vsr = vs.permuted(rcm(vs.indptr, vs.indices))
        xv = np.random.default_rng(1).standard_normal(vs.n).astype(np.float32)
        xvj = jnp.asarray(xv)
        y_ref = vsr.matvec(xv)
        print("== varstencil_1024 planner-packed check (native RCM) ==",
              flush=True)
        from tpu_spmv.tune.model import tpu_plan

        plan = tpu_plan(vsr, assume_rcm=True)
        print(f"  plan: {plan.kernel} (cost {plan.est_cost:.3g}) | "
              f"{plan.reason}", flush=True)
        run("varstencil ranked", spmv_ranked, RankedSlabs.from_csr(vsr),
            xvj, y_ref)
        run("varstencil packed", spmv_packed, PackedRanked.from_csr(vsr),
            xvj, y_ref)


if __name__ == "__main__":
    main()
