"""Packed mixed-height layout + kernel (formats/packed.py).

The sublane-quantum padding (8/avg_row_len, 1.60x on the flagship
class) is removed by stacking chunk slabs back-to-back; correctness
rides the in-kernel 3-way segmented reduce and the cross-tile carry.
"""

import numpy as np
import jax.numpy as jnp

from tpu_spmv.bench.matrices import laplacian_2d, random_banded
from tpu_spmv.formats.packed import PackedRanked
from tpu_spmv.kernels.packed import spmv_packed


def _rel(a, b):
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


def test_packed_matches_oracle():
    for mat in (
        laplacian_2d(16),
        laplacian_2d(40),
        random_banded(640, 40, 8, seed=4),
        random_banded(500, 60, 5, seed=1),  # skewed heights
    ):
        lay = PackedRanked.from_csr(mat)
        x = np.random.default_rng(0).standard_normal(mat.n).astype(
            np.float32
        )
        y = np.asarray(spmv_packed(lay, jnp.asarray(x), interpret=True))
        assert _rel(y, mat.matvec(x)) < 1e-6, mat.shape


def test_packed_carry_crosses_tiles():
    """Chunks spanning grid-tile boundaries: the VMEM carry register
    must survive sequential grid steps (multi-tile layout)."""
    mat = laplacian_2d(150)  # ~22.5k rows -> several 512-sublane tiles
    lay = PackedRanked.from_csr(mat, tile_k=512)
    assert int(lay.vals.shape[0]) // lay.tile_k >= 2
    x = np.random.default_rng(1).standard_normal(mat.n).astype(np.float32)
    y = np.asarray(spmv_packed(lay, jnp.asarray(x), interpret=True))
    assert _rel(y, mat.matvec(x)) < 1e-6


def test_packed_removes_quantum_padding():
    """On the flagship class (RCM-banded, ~5 nnz/row) the packed layout
    must hold padding near 1.0x where the quantized layout pays ~1.6x
    (VERDICT r2 weak #2: the 8-sublane quantum was the whole gap)."""
    from tpu_spmv.formats.sell import RankedSlabs

    # Large enough that the 512-sublane tile quantum is noise (~131k
    # rows); layout build only, no kernel run.
    mat = laplacian_2d(362)
    packed = PackedRanked.from_csr(mat)
    quant = RankedSlabs.from_csr(mat)
    assert packed.padding_ratio < 1.2
    assert quant.padding_ratio > 1.5
    assert packed.hbm_bytes < 0.85 * quant.hbm_bytes


def test_packed_two_ends_per_subtile():
    """Mixed sub-tiles holding two chunk completions (kc=4 chains) are
    segmented correctly."""
    # 3 nnz/row -> kc_raw ~3-4 -> MIN_KC=4 extents chain 2 ends per
    # sub-tile regularly.
    mat = random_banded(2000, 20, 3, seed=7)
    lay = PackedRanked.from_csr(mat)
    bmeta = np.asarray(lay.bmeta)
    assert (bmeta >> 8).max() == 2  # the shape this test exists for
    x = np.random.default_rng(2).standard_normal(mat.n).astype(np.float32)
    y = np.asarray(spmv_packed(lay, jnp.asarray(x), interpret=True))
    assert _rel(y, mat.matvec(x)) < 1e-6


def test_packed_tiny_single_chunk():
    """m < 128: one chunk, one partial row, carry never crosses."""
    mat = random_banded(90, 10, 4, seed=9)
    lay = PackedRanked.from_csr(mat)
    x = np.random.default_rng(9).standard_normal(mat.n).astype(np.float32)
    y = np.asarray(spmv_packed(lay, jnp.asarray(x), interpret=True))
    assert _rel(y, mat.matvec(x)) < 1e-6


def test_packed_empty_rows():
    """Rows with zero nonzeros still get MIN_KC slots and solve to 0."""
    mat = random_banded(400, 20, 5, seed=10)
    # Zero out two chunks' worth of rows structurally.
    indptr = mat.indptr.copy()
    keep = np.ones(mat.nnz, bool)
    lo, hi = mat.indptr[128], mat.indptr[256]
    keep[lo:hi] = False
    lens = np.diff(mat.indptr)
    lens[128:256] = 0
    indptr = np.concatenate([[0], np.cumsum(lens)]).astype(mat.indptr.dtype)
    from tpu_spmv.formats.csr import CSRMatrix

    mat2 = CSRMatrix(indptr, mat.indices[keep], mat.data[keep], mat.shape)
    lay = PackedRanked.from_csr(mat2)
    x = np.random.default_rng(11).standard_normal(mat2.n).astype(np.float32)
    y = np.asarray(spmv_packed(lay, jnp.asarray(x), interpret=True))
    ref = mat2.matvec(x)
    assert np.all(y[128:256] == 0.0)
    assert _rel(y, ref) < 1e-6


def test_packed_grouped_matches_delta():
    """Grouped-window packed kernel (G absolute SMEM bases) reproduces
    the packed-delta kernel exactly on a stencil matrix."""
    from tpu_spmv.bench.matrices import laplacian_2d

    mat = laplacian_2d(48)
    x = np.random.default_rng(13).standard_normal(mat.n).astype(np.float32)
    lg = PackedRanked.from_csr(mat, allow_groups=True)
    ld = PackedRanked.from_csr(mat, allow_groups=False)
    assert lg.group_code != 0 and ld.group_code == 0
    yg = np.asarray(spmv_packed(lg, jnp.asarray(x), interpret=True))
    yd = np.asarray(spmv_packed(ld, jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(yg, yd)
    assert _rel(yg, mat.matvec(x)) < 1e-6


def test_packed_layout_cache_roundtrip(tmp_path):
    """PackedRanked persists through the .npz layout cache (the
    reference's precomputed-artifact role, like sell/ranked)."""
    from tpu_spmv.formats.sell import load_layout

    mat = random_banded(900, 40, 8, seed=2)
    lay = PackedRanked.from_csr(mat)
    path = str(tmp_path / "pk.npz")
    lay.save(path, mat, config=(0, 0, 1))
    back = load_layout(path, mat, config=(0, 0, 1))
    assert type(back) is PackedRanked
    x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
    ya = np.asarray(spmv_packed(lay, jnp.asarray(x), interpret=True))
    yb = np.asarray(spmv_packed(back, jnp.asarray(x), interpret=True))
    assert np.array_equal(ya, yb)


def test_packed_tile_padup_correctness():
    """r4 grid-tile pad-up, packed variant: a layout whose natural
    512-quantized total_k is NOT a multiple of the tile must pad up to
    2048-sublane tiles (inert sub-tiles: vals=0, bmeta E=0) and still
    reproduce the oracle through the kernel, including the cross-tile
    carry landing before the pad region."""
    mat = random_banded(80_000, 400, 9, seed=7)
    from tpu_spmv.reorder import rcm

    mat = mat.permuted(rcm(mat.indptr, mat.indices))
    lay = PackedRanked.from_csr(mat)
    assert lay.tile_k == 2048  # padded up from the 512 quantum
    assert int(lay.vals.shape[0]) % 2048 == 0
    # The pad is real: a 512-cap build (pick_tile_k path, no pad-up)
    # ends at the natural 512-quantized total_k.
    lay512 = PackedRanked.from_csr(mat, tile_k=512)
    assert lay512.tile_k == 512
    assert int(lay.vals.shape[0]) > int(lay512.vals.shape[0])
    x = np.random.default_rng(3).standard_normal(mat.n).astype(np.float32)
    y = np.asarray(spmv_packed(lay, jnp.asarray(x), interpret=True))
    y512 = np.asarray(spmv_packed(lay512, jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(y, y512)
    assert _rel(y, mat.matvec(x)) < 1e-6


def test_packed_binned_matches_oracle():
    """Packed + column-binned slots (the r5 irregular-matrix mode):
    binned windows bound the gather span on matrices without band
    clusters while the mixed heights remove the 8-sublane quantum fill
    and the in-kernel emit replaces the segment-sum epilogue."""
    from tpu_spmv.bench.matrices import random_general

    rng = np.random.default_rng(21)
    for mat, W in (
        (random_general(3000, 6, seed=3), 4),
        (random_general(1500, 3, seed=5), 2),
        (random_banded(2000, 300, 5, seed=6), 2),
    ):
        lay = PackedRanked.from_csr(mat, bin_blocks=W)
        x = rng.standard_normal(mat.n).astype(np.float32)
        y = np.asarray(spmv_packed(lay, jnp.asarray(x), interpret=True))
        assert _rel(y, mat.matvec(x)) < 1e-6, (mat.shape, W)


def test_packed_binned_cuts_quantum_fill():
    """On an irregular low-degree matrix the packed-binned layout must
    pad strictly less than the quantized ranked-binned layout at the
    same bin width (the fill the r4 file sweeps paid was mostly the
    8-sublane quantum)."""
    from tpu_spmv.formats.sell import RankedSlabs

    mat = random_banded(60_000, 500, 4, seed=12)
    W = 2
    pk = PackedRanked.from_csr(mat, bin_blocks=W)
    rk = RankedSlabs.from_csr(mat, bin_blocks=W)
    assert pk.padding_ratio < 0.9 * rk.padding_ratio, (
        pk.padding_ratio, rk.padding_ratio
    )
    x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
    y = np.asarray(spmv_packed(pk, jnp.asarray(x), interpret=True))
    assert _rel(y, mat.matvec(x)) < 1e-6


def test_spmm_packed_matches_columnwise_spmv():
    """spmm_packed == B independent spmv_packed columns, across the
    delta-window, grouped-window, binned, and multi-tile carry paths."""
    from tpu_spmv.kernels.spmm import spmm_packed

    cases = [
        (laplacian_2d(40), dict()),
        (random_banded(640, 40, 8, seed=4), dict()),
        (laplacian_2d(150), dict(tile_k=512)),      # carry across tiles
        (random_banded(800, 120, 10, seed=2), dict(bin_blocks=2)),
    ]
    for B in (1, 3, 8):
        for mat, kw in cases:
            lay = PackedRanked.from_csr(mat, **kw)
            X = np.random.default_rng(B).standard_normal(
                (mat.n, B)
            ).astype(np.float32)
            Y = np.asarray(spmm_packed(lay, jnp.asarray(X), interpret=True))
            ref = np.stack(
                [mat.matvec(X[:, b]) for b in range(B)], axis=1
            )
            assert Y.shape == ref.shape
            assert _rel(Y, ref) < 1e-6, (mat.shape, B, kw)


def test_spmm_packed_grouped_path():
    from tpu_spmv.kernels.spmm import spmm_packed

    mat = laplacian_2d(48)
    lay_g = PackedRanked.from_csr(mat, allow_groups=True)
    assert lay_g.group_code != 0
    X = np.random.default_rng(0).standard_normal((mat.n, 4)).astype(
        np.float32
    )
    Y = np.asarray(spmm_packed(lay_g, jnp.asarray(X), interpret=True))
    ref = np.stack([mat.matvec(X[:, b]) for b in range(4)], axis=1)
    assert _rel(Y, ref) < 1e-6
