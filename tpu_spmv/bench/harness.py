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


def _loop_fn(spmv):
    # The layout is a jit ARGUMENT (it is a registered pytree), not a
    # closure constant: closing over it bakes the slab arrays into the
    # HLO as literals, which the remote-compile relay rejects for large
    # matrices (HTTP 413) and which skews constant folding.
    #
    # reps is a TRACED argument (dynamic fori trip count), so every
    # reps value runs the SAME compiled executable. With one executable
    # per reps value (the r1-r4 protocol), a single unlucky Mosaic/XLA
    # compile poisoned the whole slope with low intra-call spread —
    # the signature of the two cross-round contradictions (r3 lap2d
    # packed 27 vs 124 GF/s, r4 lap2d auto 8.9 vs 148.5: same layout,
    # same kernel, consistently slow for exactly one bench call). A
    # shared executable makes the lo/hi per-iteration cost identical
    # by construction, and the adaptive reps ladder stops recompiling.
    @jax.jit
    def run(layout, x, reps):
        def body(i, xv):
            y = spmv(layout, xv)
            if y.shape == xv.shape:
                # Nonlinear-ish feedback so XLA cannot hoist the SpMV
                # out of the loop, while keeping magnitudes bounded.
                return y * 0.125 + xv * 0.25
            # Rectangular layouts (m != n, e.g. a wide scattered matrix
            # through the striped kernel): fold y back through a scalar
            # so each iteration still depends on the previous SpMV.
            # 0.1 keeps x bounded away from zero as 0.25**k decays it.
            return xv * 0.25 + (jnp.sum(y) * 1e-20 + 0.1)
        return jax.lax.fori_loop(0, reps, body, x)

    return run


def _times(fn, layout, x, reps: int, samples: int) -> list:
    r = jnp.asarray(reps, dtype=jnp.int32)
    out = []
    for _ in range(samples):
        t0 = time.perf_counter()
        np.asarray(fn(layout, x, r))
        out.append(time.perf_counter() - t0)
    return out


def bench_spmv(
    spmv,
    layout,
    x: jax.Array,
    reps_lo: int = 8,
    reps_hi: int = 108,
    samples: int = 3,
    nnz: int | None = None,
    _depth: int = 0,
) -> BenchResult:
    """Slope-timed SpMV benchmark.

    spmv: callable (layout, x) -> y; square and rectangular (m != n)
    layouts both chain iterations data-dependently (see _loop_fn).

    The ~26ms fetch quantum has several-ms jitter, so the slope uses
    min-over-samples at each reps value and the reps gap adaptively grows
    until the work difference dominates the jitter (>= 4 quanta): below
    that, quantization alone produces 10-30% slope error.
    """
    fn = _loop_fn(spmv)
    np.asarray(fn(layout, x, jnp.asarray(reps_lo, jnp.int32)))  # compile+warm
    ts_lo = _times(fn, layout, x, reps_lo, samples)
    ts_hi = _times(fn, layout, x, reps_hi, samples)
    # Grow the gap until the measured difference is well above jitter
    # (no recompiles: reps is a traced argument of the one executable).
    while (min(ts_hi) - min(ts_lo)) < 0.1 and _depth < 4:
        reps_hi = reps_lo + (reps_hi - reps_lo) * 4
        ts_hi = _times(fn, layout, x, reps_hi, samples)
        _depth += 1
    dreps = reps_hi - reps_lo
    # Per-sample slope spread (the reference's TimeMin/Max/Avg semantics,
    # spmv-csrk/spmv.cpp:168-191): time_min pairs the two sample minima
    # (robust to one-sided fetch jitter), while the spread pairs hi
    # sample i with lo sample i — pairing every hi with the single best
    # lo attributed all lo-side jitter to the hi samples and biased
    # time_max/avg upward (ADVICE r2).
    t_min = max((min(ts_hi) - min(ts_lo)) / dreps, 1e-9)
    slopes = [
        max((th - tl) / dreps, 1e-9) for th, tl in zip(ts_hi, ts_lo)
    ]
    if nnz is None:
        nnz = getattr(layout, "nnz")
    t_avg = max(sum(slopes) / len(slopes), t_min)
    return BenchResult(
        time_min=t_min,
        time_max=max(max(slopes), t_avg),
        time_avg=t_avg,
        nnz=nnz,
        iters=(reps_lo, reps_hi, samples),
    )


def _loop_fn_cold(spmv):
    # Cold-regime variant: each fori iteration chains K SpMV calls over
    # K DISTINCT operator copies (jit arguments, so XLA cannot alias
    # them). Sized so K * layout bytes exceeds VMEM, the operator
    # cannot stay VMEM-resident between consecutive uses — every call
    # pays the full HBM fetch, which is the single-shot serving bound
    # the resident chained protocol hides (docs/PERF_NOTES.md r4
    # "measurement-regime" note). reps is traced (see _loop_fn).
    @jax.jit
    def run(layouts, x, reps):
        def body(i, xv):
            for lay in layouts:
                y = spmv(lay, xv)
                xv = y * 0.125 + xv * 0.25
            return xv

        return jax.lax.fori_loop(0, reps, body, x)

    return run


def clone_layout(layout):
    """Fresh device copy of a layout pytree (distinct buffers: the
    leaves round-trip through host memory, so XLA cannot alias two
    clones)."""
    leaves, treedef = jax.tree_util.tree_flatten(layout)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(np.asarray(leaf)) for leaf in leaves]
    )


def device_bytes(layout) -> int:
    """Total device bytes of a layout pytree's array leaves."""
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(layout)
        if hasattr(leaf, "dtype")
    )


def bench_spmv_cold(
    spmv,
    make_layout,
    x: jax.Array,
    nnz: int,
    layout_bytes: int,
    vmem_bytes: int = 128 * 2**20,
    reps_lo: int = 2,
    reps_hi: int = 16,
    samples: int = 3,
) -> BenchResult:
    """Slope-timed COLD SpMV: the operator streams from HBM each call.

    make_layout: zero-arg callable building a fresh device copy of the
    layout (distinct buffers per copy — building from host arrays, not
    device aliases). K copies are chained cyclically with K chosen so
    the working set is >= 2x VMEM; the reported per-call time is the
    K-round slope divided by K.
    """
    K = max(2, int(np.ceil(2 * vmem_bytes / max(layout_bytes, 1))))
    layouts = tuple(make_layout() for _ in range(K))
    fn = _loop_fn_cold(spmv)
    np.asarray(fn(layouts, x, jnp.asarray(reps_lo, jnp.int32)))  # warm
    ts_lo = _times(fn, layouts, x, reps_lo, samples)
    ts_hi = _times(fn, layouts, x, reps_hi, samples)
    grow = 0
    while (min(ts_hi) - min(ts_lo)) < 0.1 and grow < 4:
        reps_hi = reps_lo + (reps_hi - reps_lo) * 4
        ts_hi = _times(fn, layouts, x, reps_hi, samples)
        grow += 1
    dcalls = (reps_hi - reps_lo) * K
    t_min = max((min(ts_hi) - min(ts_lo)) / dcalls, 1e-9)
    slopes = [
        max((th - tl) / dcalls, 1e-9) for th, tl in zip(ts_hi, ts_lo)
    ]
    t_avg = max(sum(slopes) / len(slopes), t_min)
    return BenchResult(
        time_min=t_min,
        time_max=max(max(slopes), t_avg),
        time_avg=t_avg,
        nnz=nnz,
        iters=(reps_lo, reps_hi, K),
    )


def roofline_nnzs(bytes_per_nnz: float, hbm_bytes_per_s: float | None = None) -> float:
    """Max nnz/s if the kernel were purely HBM-bandwidth-bound.

    The ceiling defaults to the running device's spec bandwidth
    (tpu_spmv.hw; v5e = 819 GB/s — best measured stream on that chip is
    ~642 GB/s, so spec-roofline percentages are conservative)."""
    if hbm_bytes_per_s is None:
        from tpu_spmv.hw import device_spec

        hbm_bytes_per_s = device_spec().hbm_bytes_per_s
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
