"""On-chip datapoint: a scattered matrix whose x exceeds the VMEM budget
runs a non-segsum kernel (VERDICT r2 next #4).

16.8M columns: x alone is 64 MB — past the resident kernels' VMEM
budget, with no band locality for the HBM-windowed kernel. The
column-striped multi-pass kernel (kernels/striped.py) cuts the columns
into VMEM-sized stripes and accumulates y over passes.

Row density 160/row (the vas_stokes/packing class of the reference's
set, helpers/params.txt): binned slots need several entries per
(chunk, bin) to amortize the 128-lane slot rows — ultra-sparse
scattered rows (<=8/row at this width) stay on segsum by design
(tune/model.py routes them there; the fill floor is 128/entries-per-
bin, a measured property of the format, not a bug).
"""

import sys

import numpy as np


def main():
    from tpu_spmv.hw import interpret_mode

    interp = interpret_mode()  # pins a JAX_PLATFORMS=cpu request

    import functools

    import jax
    import jax.numpy as jnp

    from tpu_spmv.bench.harness import bench_spmv, validate
    from tpu_spmv.formats.csr import CSRMatrix
    from tpu_spmv.kernels.striped import StripedRanked, spmv_striped

    spmv_striped = functools.partial(spmv_striped, interpret=interp)

    import os

    # Env-shrinkable for a CPU interpret-mode smoke of this exact script.
    m = int(os.environ.get("SCAT_M", 131_072))
    n = int(os.environ.get("SCAT_N", 16_777_216))
    per_row = int(os.environ.get("SCAT_PER_ROW", 160))
    # None = the kernel's VMEM-derived default (chip runs); the CPU
    # smoke shrinks it alongside the matrix.
    stripe_cols = (
        int(os.environ["SCAT_STRIPE_COLS"])
        if "SCAT_STRIPE_COLS" in os.environ else None
    )
    rng = np.random.default_rng(0)
    indptr = np.arange(0, m * per_row + 1, per_row, dtype=np.int64)
    indices = rng.integers(0, n, size=m * per_row, dtype=np.int64)
    indices = np.sort(indices.reshape(m, per_row), axis=1).reshape(-1)
    data = rng.standard_normal(m * per_row).astype(np.float32)
    mat = CSRMatrix(
        indptr.astype(np.int64), indices.astype(np.int32), data, (m, n)
    )

    # Pick the bin width by measured fill on a 64-chunk row sample.
    sm = min(m, 64 * 128)
    sample = CSRMatrix(
        mat.indptr[: sm + 1], mat.indices[: mat.indptr[sm]],
        mat.data[: mat.indptr[sm]], (sm, n),
    )
    best_w, best_pad = 16, float("inf")
    for w in (16, 32, 64):
        try:
            s = StripedRanked.from_csr(sample, stripe_cols=stripe_cols, bin_blocks=w)
        except ValueError:
            continue
        if s.padding_ratio < best_pad:
            best_w, best_pad = w, s.padding_ratio

    lay = StripedRanked.from_csr(mat, stripe_cols=stripe_cols, bin_blocks=best_w)
    print(
        f"W={best_w} stripes={lay.num_stripes} stripe_cols="
        f"{lay.stripe_cols} pad={lay.padding_ratio:.2f} "
        f"rank_nb={lay.rank_nb}",
        file=sys.stderr,
    )
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(spmv_striped(lay, jnp.asarray(x)))
    wrong, rel = validate(y, mat.matvec(x))
    res = bench_spmv(spmv_striped, lay, jnp.asarray(x), reps_lo=2, reps_hi=12)
    print(
        f"platform={jax.devices()[0].platform} wrong={wrong} rel={rel:.1e} "
        f"gflops={res.gflops:.2f} gnnzs={res.gnnzs:.2f} "
        f"time_min={res.time_min:.4f}s"
    )
    assert wrong == 0

    # bf16 value-storage datum on the same layout plan: at 160 nnz/row
    # the binned fill is low, so value bytes dominate — the halved
    # traffic should show here if the striped kernel is bandwidth-bound
    # (validated against the bf16-rounded operator).
    try:
        lay_b = StripedRanked.from_csr(
            mat, stripe_cols=stripe_cols, bin_blocks=best_w,
            val_dtype=jnp.bfloat16,
        )
        y_b = np.asarray(spmv_striped(lay_b, jnp.asarray(x)))
        wrong_b, rel_b = validate(
            y_b, mat.rounded(jnp.bfloat16).matvec(x)
        )
        res_b = bench_spmv(
            spmv_striped, lay_b, jnp.asarray(x), reps_lo=2, reps_hi=12
        )
        print(
            f"bf16: wrong={wrong_b} rel_vs_rounded={rel_b:.1e} "
            f"gflops={res_b.gflops:.2f} (vs {res.gflops:.2f} f32)"
        )
        assert wrong_b == 0
    except Exception as e:  # pragma: no cover - chip-dependent
        print(f"bf16 datum unavailable: {e!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
