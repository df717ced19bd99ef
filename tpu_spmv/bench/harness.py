"""Benchmark harness: the reference's protocol, adapted to remote TPUs.

The reference times each SpMV call individually around a device sync
(5 warmups + N timed, reporting TimeMin/TimeMax/TimeAvg —
spmv-csrk/spmv.cpp:161-191). On this platform that protocol is invalid:
`block_until_ready` does not actually block through the axon tunnel, and
a device->host fetch carries a ~26ms quantum. Instead we use the SLOPE
protocol: chain K dependent SpMV iterations inside one jit via
lax.fori_loop, fetch-time the whole call at two values of K, and report
per-iteration time as the slope. The classic keys (TimeMin/TimeMax/
TimeAvg) are still emitted for reference-parity, computed over slope
samples.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class BenchResult:
    time_min: float  # seconds per SpMV (slope estimate, min over samples)
    time_max: float
    time_avg: float
    nnz: int
    iters: tuple

    @property
    def gflops(self) -> float:
        return 2.0 * self.nnz / self.time_min / 1e9

    @property
    def gnnzs(self) -> float:
        return self.nnz / self.time_min / 1e9

    def summary(self) -> str:
        """The reference's stdout keys (spmv-csr/spmv.c:183-185)."""
        return (
            f"TimeMin: {self.time_min:.6g}\n"
            f"TimeMax: {self.time_max:.6g}\n"
            f"TimeAvg: {self.time_avg:.6g}\n"
            f"GFLOPs: {self.gflops:.4g}\n"
        )


def _loop_fn(spmv, layout, reps):
    @jax.jit
    def run(x):
        def body(i, xv):
            y = spmv(layout, xv)
            # Nonlinear-ish feedback so XLA cannot hoist the SpMV out of
            # the loop, while keeping magnitudes bounded.
            return y * 0.125 + xv * 0.25
        return jax.lax.fori_loop(0, reps, body, x)

    return run


def bench_spmv(
    spmv,
    layout,
    x: jax.Array,
    reps_lo: int = 4,
    reps_hi: int = 36,
    samples: int = 3,
    nnz: int | None = None,
) -> BenchResult:
    """Slope-timed SpMV benchmark.

    spmv: callable (layout, x) -> y with len(y) == len(x) (square matrix).
    """
    lo = _loop_fn(spmv, layout, reps_lo)
    hi = _loop_fn(spmv, layout, reps_hi)
    np.asarray(lo(x))  # compile + warm both
    np.asarray(hi(x))
    slopes = []
    for _ in range(samples):
        t0 = time.perf_counter()
        np.asarray(lo(x))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(hi(x))
        t_hi = time.perf_counter() - t0
        slopes.append((t_hi - t_lo) / (reps_hi - reps_lo))
    if nnz is None:
        nnz = getattr(layout, "nnz")
    return BenchResult(
        time_min=min(slopes),
        time_max=max(slopes),
        time_avg=sum(slopes) / len(slopes),
        nnz=nnz,
        iters=(reps_lo, reps_hi, samples),
    )


# HBM bandwidth ceiling used for roofline reporting. Spec for TPU v5e is
# ~819 GB/s; the best measured stream on this chip (Pallas (512,128)
# blocks) is ~642 GB/s.
HBM_BYTES_PER_S = 819e9


def roofline_nnzs(bytes_per_nnz: float, hbm_bytes_per_s: float = HBM_BYTES_PER_S) -> float:
    """Max nnz/s if the kernel were purely HBM-bandwidth-bound."""
    return hbm_bytes_per_s / bytes_per_nnz


def validate(y_device: np.ndarray, y_oracle_permuted: np.ndarray, tol: float = 0.01):
    """Reference validation: elementwise abs tolerance count ('Number
    Wrong', spmv-csrk/spmv.cpp:202-211) plus rel-L2 (our stricter bar)."""
    y_device = np.asarray(y_device)
    num_wrong = int(np.sum(np.abs(y_device - y_oracle_permuted) > tol))
    rel_l2 = float(
        np.linalg.norm(y_device - y_oracle_permuted)
        / max(np.linalg.norm(y_oracle_permuted), 1e-30)
    )
    return num_wrong, rel_l2
