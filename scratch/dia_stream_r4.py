"""DIA streaming experiments (r4): rows_per_tile sweep + tile-major vals.

The r4 ablation (results/dia_ablate_r4.txt) shows the kernel ~86% of
its own valsonly ceiling; the ceiling itself streams at ~540 GB/s
effective vs the chip's ~640 measured stream. Two candidate levers:

  (a) rows_per_tile 8192 -> 16384/32768: bigger DMAs, fewer grid steps
  (b) tile-major vals (T, d, rb, 128): ONE contiguous DMA per grid step
      instead of d strided segments

PYTHONPATH=/root/repo:/root/.axon_site python scratch/dia_stream_r4.py
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_spmv.bench.harness import bench_spmv, validate
from tpu_spmv.bench.matrices import laplacian_2d
from tpu_spmv.formats.dia import DiaSlabs
from tpu_spmv.formats.sell import LANES
from tpu_spmv.kernels.dia import _split_offset, spmv_dia

BIG = dict(reps_lo=50, reps_hi=1050, samples=4)


def run_pkg(tag, lay, xj, y_ref):
    y = np.asarray(spmv_dia(lay, xj))
    wrong, rel = validate(y, y_ref)
    r = bench_spmv(spmv_dia, lay, xj, **BIG)
    print(f"{tag}: {r.gflops:.2f} GF/s tmin={r.time_min:.4e} "
          f"wrong={wrong}", flush=True)


def spmv_dia_tilemajor(offsets, rb, glo, nb, m, n, hbm_bytes):
    """vals pre-arranged (T, d, rb, 128): one contiguous DMA per step."""
    d = len(offsets)
    num_tiles = nb // rb
    qbs = [_split_offset(o)[0] for o in offsets]
    ghi = max(max(qbs) + 2, 1)
    n_blocks = glo + nb + ghi

    def kernel(vals_ref, x_ref, y_ref):
        t = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
        acc = jnp.zeros((rb, LANES), jnp.float32)
        for k, off in enumerate(offsets):
            qb, s = _split_offset(off)
            base = t * rb + (glo + qb)
            a = x_ref[pl.ds(base, rb), :]
            if s == 0:
                shifted = a
            else:
                b = x_ref[pl.ds(base + 1, rb), :]
                shifted = pltpu.roll(
                    jnp.where(lane < s, b, a), (LANES - s) % LANES, axis=1
                )
            acc = acc + vals_ref[0, k].astype(jnp.float32) * shifted
        y_ref[...] = acc

    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, d, rb, LANES), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def fn(vals_tm, x):
        x2d = jnp.zeros((n_blocks * LANES,), jnp.float32)
        x2d = jax.lax.dynamic_update_slice(
            x2d, x.astype(jnp.float32), (glo * LANES,)
        ).reshape(n_blocks, LANES)
        y = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, LANES), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * d * nb * LANES, bytes_accessed=hbm_bytes,
                transcendentals=0,
            ),
        )(vals_tm, x2d)
        return y.reshape(-1)[:m]

    return fn


def main():
    raw = laplacian_2d(1024)
    x = np.random.default_rng(0).standard_normal(raw.n).astype(np.float32)
    xj = jnp.asarray(x)
    y_ref = raw.matvec(x)

    for dtype, tag in ((jnp.bfloat16, "bf16"), (None, "f32")):
        for rpt in (8192, 16384, 32768):
            lay = DiaSlabs.from_csr(raw, val_dtype=dtype,
                                    rows_per_tile=rpt)
            run_pkg(f"dia {tag} rpt={rpt}", lay, xj, y_ref)

    # Tile-major variant at each rpt (bf16 only — the flagship config).
    for rpt in (8192, 16384, 32768):
        lay = DiaSlabs.from_csr(raw, val_dtype=jnp.bfloat16,
                                rows_per_tile=rpt)
        d = lay.num_diagonals
        rb = rpt // LANES
        nb = lay.num_blocks
        T = nb // rb
        qbs = [_split_offset(o)[0] for o in lay.offsets]
        glo = max(0, -min(qbs))
        vals_tm = jnp.asarray(
            np.asarray(lay.vals).reshape(d, T, rb, LANES)
            .transpose(1, 0, 2, 3).copy()
        )
        fn = spmv_dia_tilemajor(
            lay.offsets, rb, glo, nb, lay.m, lay.n, lay.hbm_bytes
        )
        y = np.asarray(fn(vals_tm, xj))
        wrong, rel = validate(y, y_ref)
        r = bench_spmv(lambda v, xx: fn(v, xx), vals_tm, xj,
                       nnz=lay.nnz, **BIG)
        print(f"dia bf16 TILE-MAJOR rpt={rpt}: {r.gflops:.2f} GF/s "
              f"tmin={r.time_min:.4e} wrong={wrong}", flush=True)


if __name__ == "__main__":
    main()
