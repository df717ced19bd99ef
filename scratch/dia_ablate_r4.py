"""DIA kernel cycle accounting (r4): where do the 37 cycles/unit go?

Runs TIMING-ONLY degraded variants of the dia kernel on lap2d_1024
(bf16 values, 5 diagonals, natural order). Only 'full' is validated;
the others intentionally compute wrong results to isolate costs:

  full      current kernel (select + single roll on unaligned arms)
  noselect  unaligned arms: roll(a) only (drops select + b load)
  noroll    unaligned arms: plain aligned load (drops roll too)
  valsonly  acc += vals (drops all x handling: pure streaming floor)

PYTHONPATH=/root/repo:/root/.axon_site python scratch/dia_ablate_r4.py
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_spmv.bench.harness import bench_spmv
from tpu_spmv.bench.matrices import laplacian_2d
from tpu_spmv.formats.dia import DiaSlabs
from tpu_spmv.formats.sell import LANES
from tpu_spmv.kernels.dia import _split_offset


def make_kernel(offsets, rb, glo, mode):
    def kernel(vals_ref, x_ref, y_ref):
        t = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
        acc = jnp.zeros((rb, LANES), jnp.float32)
        for k, off in enumerate(offsets):
            qb, s = _split_offset(off)
            base = t * rb + (glo + qb)
            v = vals_ref[k].astype(jnp.float32)
            if mode == "valsonly":
                acc = acc + v
                continue
            a = x_ref[pl.ds(base, rb), :]
            if s == 0 or mode == "noroll":
                shifted = a
            elif mode == "noselect":
                shifted = pltpu.roll(a, (LANES - s) % LANES, axis=1)
            else:
                b = x_ref[pl.ds(base + 1, rb), :]
                shifted = pltpu.roll(
                    jnp.where(lane < s, b, a), (LANES - s) % LANES, axis=1
                )
            acc = acc + v * shifted
        y_ref[...] = acc

    return kernel


def run_variant(layout, x, mode):
    d = layout.num_diagonals
    rb = layout.rows_per_tile // LANES
    nb = layout.num_blocks
    num_tiles = nb // rb
    qbs = [_split_offset(o)[0] for o in layout.offsets]
    glo = max(0, -min(qbs))
    ghi = max(max(qbs) + 2, 1)
    n_blocks = glo + nb + ghi

    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((d, rb, LANES), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def fn(layout, xflat):
        # xflat is the bench harness's loop-varying state: the kernel
        # consumes it, so the pallas_call cannot be hoisted.
        return pl.pallas_call(
            make_kernel(layout.offsets, rb, glo, mode),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, LANES), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * layout.vals.size,
                bytes_accessed=layout.hbm_bytes, transcendentals=0,
            ),
        )(layout.vals, xflat.reshape(n_blocks, LANES)).reshape(-1)[
            : layout.m
        ]

    x0 = np.zeros(n_blocks * LANES, np.float32)
    x0[glo * LANES : glo * LANES + layout.n] = x
    r = bench_spmv(fn, layout, jnp.asarray(x0), reps_lo=50, reps_hi=1050,
                   samples=4, nnz=layout.nnz)
    units = -(-layout.m // (8 * LANES))
    cyc = r.time_min * 940e6 / units
    print(f"{mode:9s}: {r.gflops:7.2f} GF/s tmin={r.time_min:.4e} "
          f"~{cyc:.1f} cyc/(8,128)unit", flush=True)
    return r


def main():
    raw = laplacian_2d(1024)
    x = np.random.default_rng(0).standard_normal(raw.n).astype(np.float32)
    for dtype, tag in ((jnp.bfloat16, "bf16"), (None, "f32")):
        lay = DiaSlabs.from_csr(raw, val_dtype=dtype)
        print(f"-- {tag} vals ({lay.num_diagonals} diagonals, "
              f"rows_per_tile={lay.rows_per_tile}) --", flush=True)
        for mode in ("full", "noselect", "noroll", "valsonly"):
            run_variant(lay, x, mode)


if __name__ == "__main__":
    main()
