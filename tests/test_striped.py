"""Column-striped multi-pass SpMV (scattered beyond the VMEM x-budget)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_spmv.bench.matrices import random_general
from tpu_spmv.formats.csr import CSRMatrix
from tpu_spmv.kernels.striped import StripedRanked, spmv_striped


def _wide_scattered(m, n, nnz_per_row, seed=0):
    """Random matrix with n >> m (the x-beyond-VMEM shape, scaled down)."""
    rng = np.random.default_rng(seed)
    lens = np.full(m, nnz_per_row, np.int64)
    indptr = np.zeros(m + 1, np.int64)
    np.cumsum(lens, out=indptr[1:])
    cols = rng.integers(0, n, int(indptr[-1]))
    order = np.argsort(
        np.repeat(np.arange(m), lens) * n + cols, kind="stable"
    )
    cols = cols[order]
    # Dedup within rows is unnecessary for SpMV correctness (duplicates
    # just sum), but keep columns sorted per row (CSRMatrix invariant).
    data = rng.standard_normal(cols.shape[0]).astype(np.float32)
    return CSRMatrix(
        indptr.astype(np.int32), cols.astype(np.int32), data, (m, n)
    )


def test_striped_matches_oracle():
    mat = _wide_scattered(512, 8192, 6, seed=3)
    lay = StripedRanked.from_csr(mat, stripe_cols=1024, bin_blocks=2)
    assert lay.num_stripes == 8
    x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
    y = np.asarray(spmv_striped(lay, jnp.asarray(x), interpret=True))
    y_ref = mat.matvec(x)
    rel = np.linalg.norm(y - y_ref) / max(np.linalg.norm(y_ref), 1e-30)
    assert rel < 1e-6, rel
    assert int(np.sum(np.abs(y - y_ref) > 0.01)) == 0


def test_striped_square_scattered():
    mat = random_general(1024, 6, seed=7)
    lay = StripedRanked.from_csr(mat, stripe_cols=512, bin_blocks=2)
    assert lay.num_stripes == 2
    x = np.random.default_rng(1).standard_normal(mat.n).astype(np.float32)
    y = np.asarray(spmv_striped(lay, jnp.asarray(x), interpret=True))
    y_ref = mat.matvec(x)
    rel = np.linalg.norm(y - y_ref) / max(np.linalg.norm(y_ref), 1e-30)
    assert rel < 1e-6, rel


def test_striped_rejects_single_stripe():
    mat = random_general(1024, 6, seed=1)
    with pytest.raises(ValueError, match="one stripe"):
        StripedRanked.from_csr(mat, stripe_cols=2048)


def test_striped_ragged_last_stripe():
    """n just over one stripe: the second stripe is nearly empty."""
    from tpu_spmv.formats.csr import CSRMatrix

    rng = np.random.default_rng(12)
    m, n, per_row = 600, 1100, 5
    sc = 1024  # stripe width: second stripe covers only 76 columns
    indptr = np.arange(0, m * per_row + 1, per_row, dtype=np.int64)
    indices = np.sort(
        rng.integers(0, n, size=(m, per_row)), axis=1
    ).reshape(-1)
    data = rng.standard_normal(m * per_row).astype(np.float32)
    mat = CSRMatrix(indptr, indices.astype(np.int32), data, (m, n))
    lay = StripedRanked.from_csr(mat, stripe_cols=sc, bin_blocks=2)
    assert lay.num_stripes == 2
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(spmv_striped(lay, jnp.asarray(x), interpret=True))
    assert (
        np.linalg.norm(y - mat.matvec(x)) / np.linalg.norm(mat.matvec(x))
        < 1e-6
    )


def test_bench_spmv_rectangular_chaining():
    """bench_spmv's fori chaining must work when m != n (the 16M-col
    scattered datapoint benches the striped kernel on a wide matrix);
    before r3 the y*a + x*b feedback required a square matrix."""
    from functools import partial

    from tpu_spmv.bench.harness import bench_spmv

    mat = _wide_scattered(256, 4096, 6, seed=5)
    lay = StripedRanked.from_csr(mat, stripe_cols=512, bin_blocks=2)
    fn = partial(spmv_striped, interpret=True)
    res = bench_spmv(fn, lay, jnp.asarray(
        np.random.default_rng(2).standard_normal(mat.n).astype(np.float32)
    ), reps_lo=1, reps_hi=3, samples=1, _depth=4)
    assert res.time_min > 0 and res.nnz == mat.nnz
