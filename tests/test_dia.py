"""DIA (diagonal-offset) layout + kernel for stencil matrices."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_spmv.bench.matrices import laplacian_2d, random_banded, random_general
from tpu_spmv.formats.csr import CSRMatrix
from tpu_spmv.formats.dia import DiaSlabs, diagonal_profile
from tpu_spmv.kernels.dia import (
    dia_x_fits, spmv_dia, spmv_dia_reference, spmv_dia_windowed,
)


def _rel(y, y_ref):
    return np.linalg.norm(y - y_ref) / max(np.linalg.norm(y_ref), 1e-30)


def test_diagonal_profile():
    mat = laplacian_2d(32)  # 5-point stencil: offsets 0, +-1, +-32
    d, fill = diagonal_profile(mat)
    assert d == 5
    assert fill == pytest.approx(5 * mat.m / mat.nnz)
    # Sampled probe agrees on a pure stencil.
    d_s, _ = diagonal_profile(mat, sample_rows=64)
    assert d_s == 5
    # Scattered matrix: ~one diagonal per nonzero -> rejected by fill.
    d_g, fill_g = diagonal_profile(random_general(512, 6, seed=0))
    assert fill_g > 10
    # Non-square is never DIA.
    sub = CSRMatrix(
        np.array([0, 1], np.int32), np.array([3], np.int32),
        np.ones(1, np.float32), (1, 8),
    )
    assert diagonal_profile(sub)[1] == float("inf")


def test_dia_matches_oracle_stencil():
    """5-point Laplacian: the flagship DIA shape. Offsets +-1 exercise
    the cross-block lane roll; +-grid the aligned-load path."""
    mat = laplacian_2d(40)  # m=1600, offsets 0,+-1,+-40 (all unaligned)
    lay = DiaSlabs.from_csr(mat, rows_per_tile=1024)
    assert lay.num_diagonals == 5
    x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
    y = np.asarray(spmv_dia(lay, jnp.asarray(x), interpret=True))
    assert _rel(y, mat.matvec(x)) < 1e-6
    # The layout-level oracle agrees too (kernel vs layout separation).
    assert _rel(spmv_dia_reference(lay, x), mat.matvec(x)) < 1e-6


def test_dia_matches_oracle_aligned_offsets():
    """Grid 128 makes the +-grid arms lane-aligned (s == 0 path)."""
    mat = laplacian_2d(128)
    lay = DiaSlabs.from_csr(mat, rows_per_tile=2048)
    x = np.random.default_rng(1).standard_normal(mat.n).astype(np.float32)
    y = np.asarray(spmv_dia(lay, jnp.asarray(x), interpret=True))
    assert _rel(y, mat.matvec(x)) < 1e-6


def test_dia_partial_diagonals():
    """Diagonals with holes (banded random keeps offsets but drops
    entries) still reproduce exactly: absent entries stay 0.0."""
    mat = random_banded(1000, 12, 6, seed=3)
    d, fill = diagonal_profile(mat)
    lay = DiaSlabs.from_csr(mat, max_diags=40, max_fill=8.0,
                            rows_per_tile=1024)
    assert lay.num_diagonals == d
    x = np.random.default_rng(2).standard_normal(mat.n).astype(np.float32)
    y = np.asarray(spmv_dia(lay, jnp.asarray(x), interpret=True))
    assert _rel(y, mat.matvec(x)) < 1e-6


def test_dia_windowed_matches_resident():
    """HBM-windowed DIA (ROUND3_SUMMARY known limit closed): same layout
    and results as the resident kernel with x streamed per tile —
    multiple grid tiles, unaligned AND aligned offsets."""
    for grid in (40, 128):  # 40: all arms unaligned; 128: +-grid aligned
        mat = laplacian_2d(grid)
        lay = DiaSlabs.from_csr(mat, rows_per_tile=1024)
        x = np.random.default_rng(4).standard_normal(mat.n).astype(
            np.float32
        )
        y_res = np.asarray(spmv_dia(lay, jnp.asarray(x), interpret=True))
        y_win = np.asarray(
            spmv_dia_windowed(lay, jnp.asarray(x), interpret=True)
        )
        assert _rel(y_win, mat.matvec(x)) < 1e-6
        np.testing.assert_array_equal(y_win, y_res)


def test_dia_x_fits_budget():
    mat = laplacian_2d(64)
    lay = DiaSlabs.from_csr(mat, rows_per_tile=1024)
    assert dia_x_fits(lay)  # 4k rows trivially resident
    # A tiny budget forces the windowed route.
    assert not dia_x_fits(lay, budget_frac=1e-6)


def test_dia_rejects_non_stencil():
    with pytest.raises(ValueError, match="diagonals|fill"):
        DiaSlabs.from_csr(random_general(512, 6, seed=1))
    sub = CSRMatrix(
        np.array([0, 1], np.int32), np.array([3], np.int32),
        np.ones(1, np.float32), (1, 8),
    )
    with pytest.raises(ValueError, match="square"):
        DiaSlabs.from_csr(sub)


def test_dia_rejects_empty_matrix():
    """Zero-nnz input passes the d/fill admission gates but the kernels
    cannot form guard windows over an empty offsets tuple (review r5):
    from_csr must reject it like any not-diagonal-structured matrix."""
    import pytest

    from tpu_spmv.formats.csr import CSRMatrix
    from tpu_spmv.formats.dia import DiaSlabs

    empty = CSRMatrix.from_coo([], [], [], (256, 256))
    with pytest.raises(ValueError):
        DiaSlabs.from_csr(empty)
