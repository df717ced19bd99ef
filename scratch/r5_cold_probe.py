"""Probe: why does the DIA cold chain read >100% of the 819 GB/s
roofline?  Three suspects:
  (a) buffer/content dedup somewhere in the clone path (identical
      values) -> compare identical clones vs distinct-random copies;
  (b) hidden residency/reuse despite 6x-VMEM working set -> K ladder;
  (c) real achievable bandwidth mismeasured -> pure chained sum-read
      of K distinct 21MB buffers gives the true ceiling.
Usage: python scratch/r5_cold_probe.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
print("INIT_OK", jax.devices(), flush=True)

from tpu_spmv.bench.harness import (
    bench_spmv_cold, clone_layout, device_bytes,
)
from tpu_spmv.formats.csr import CSRMatrix
from tpu_spmv.formats.dia import DiaSlabs
from tpu_spmv.kernels.dia import spmv_dia
from tpu_spmv.bench.matrices import laplacian_2d

VMEM = 128 * 2**20


def slope_time(fn, args_lo, args_hi, reps_lo, reps_hi, calls_per_rep,
               samples=3):
    """min-pairwise slope per inner call, blocking."""
    def run(args, reps):
        out = []
        r = jnp.asarray(reps, jnp.int32)
        for _ in range(samples):
            t0 = time.perf_counter()
            np.asarray(fn(*args, r))
            out.append(time.perf_counter() - t0)
        return out
    ts_lo = run(args_lo, reps_lo)
    ts_hi = run(args_hi, reps_hi)
    return (min(ts_hi) - min(ts_lo)) / ((reps_hi - reps_lo) * calls_per_rep)


# ---- pure chained read bandwidth: K distinct random 21MB buffers ----
def pure_read(K, mb=21.0, reps_lo=2, reps_hi=18):
    shape = (int(mb * 2**20 / 4 / 128), 128)
    rng = np.random.default_rng(0)
    bufs = tuple(
        jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
        for _ in range(K)
    )
    nbytes = sum(b.size * 4 for b in bufs) / K

    @jax.jit
    def run(bufs, s0, reps):
        def body(i, s):
            for b in bufs:
                # jnp.minimum(b, s) is not factorable out of the loop
                # (jnp.sum(b) alone gets hoisted -> negative slopes).
                s = s * 0.5 + jnp.sum(jnp.minimum(b, s))
            return s
        return jax.lax.fori_loop(0, reps, body, s0)

    s0 = jnp.float32(0.0)
    np.asarray(run(bufs, s0, jnp.asarray(2, jnp.int32)))  # warm
    t = slope_time(lambda b, s, r: run(b, s, r), (bufs, s0), (bufs, s0),
                   reps_lo, reps_hi, K)
    print(f"pure-read K={K} ({K*nbytes/2**20:.0f} MB set): "
          f"{t*1e6:.2f} us/buf = {nbytes/t/1e9:.1f} GB/s", flush=True)
    return nbytes / t


# ---- DIA cold ladder ----
def dia_cold(kmul, distinct):
    mat = laplacian_2d(1024)
    lay = DiaSlabs.from_csr(mat)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        mat.n).astype(np.float32))
    lbytes = device_bytes(lay)
    rng = np.random.default_rng(2)

    def make():
        if not distinct:
            return clone_layout(lay)
        # Same structure, fresh random values: defeats any
        # content-based dedup anywhere in the stack.
        v = rng.standard_normal(lay.vals.shape).astype(np.float32)
        return DiaSlabs(jnp.asarray(v), lay.offsets, lay.m, lay.n,
                        lay.nnz, lay.rows_per_tile)

    import tpu_spmv.bench.harness as H
    K = max(3, int(np.ceil(kmul * VMEM / lbytes)))
    old = H.bench_spmv_cold
    res = bench_spmv_cold(
        spmv_dia, make, x, nnz=mat.nnz, layout_bytes=int(lbytes / kmul * 6),
    )  # layout_bytes scaled so internal K == kmul * VMEM / lbytes
    gbs_op = lbytes / res.time_min / 1e9
    print(f"dia-cold kmul={kmul} distinct={distinct} K={res.iters[2]} "
          f"({res.iters[2]*lbytes/2**20:.0f} MB set): "
          f"{res.time_min*1e6:.2f} us/call, operator-only "
          f"{gbs_op:.1f} GB/s", flush=True)
    return res


if __name__ == "__main__":
    pure_read(8)
    pure_read(40)
    print("done", flush=True)
