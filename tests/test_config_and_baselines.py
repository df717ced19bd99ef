"""Config file parsing, BCOO baseline parity, analyzers, kernel planner."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_spmv.bench.matrices import laplacian_2d, random_banded, random_general
from tpu_spmv.config import RunConfig
from tpu_spmv.kernels.bcoo import BCOOLayout, spmv_bcoo
from tpu_spmv.tools.analyze import format_overheads, load_balance
from tpu_spmv.tune.model import exact_rank_nb, tpu_plan


def test_config_spmv_roundtrip(tmp_path):
    p = tmp_path / "configSpMV.txt"
    # The reference's format: kernelType coarsenType k supRowSizes...
    # (readConfigFile, spmv-csrk/csrk.cpp:15-54)
    p.write_text("SpMV HAND 3 8 16\n")
    cfg = RunConfig.parse_file(str(p))
    assert cfg.kernel_type == "SpMV"
    assert cfg.coarsen_type == "hand"
    assert cfg.k == 3
    assert cfg.sup_row_sizes == (8, 16)
    out = tmp_path / "out.txt"
    cfg.write_file(str(out))
    assert RunConfig.parse_file(str(out)) == cfg


def test_config_sts():
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "configSTS.txt")
        with open(p, "w") as f:
            f.write("STS COLOR HAND 3 32\n")
        cfg = RunConfig.parse_file(p)
        assert cfg.kernel_type == "STS"
        assert cfg.ordering_type == "COLOR"
        assert cfg.k == 3
        assert cfg.sup_row_sizes == (32,)


def test_config_env(monkeypatch):
    monkeypatch.setenv("TPU_SPMV_KERNEL", "ranked")
    monkeypatch.setenv("TPU_SPMV_SUP_ROW_SIZES", "8,16")
    cfg = RunConfig.from_env()
    assert cfg.kernel == "ranked"
    assert cfg.sup_row_sizes == (8, 16)


def test_bcoo_matches_oracle():
    mat = random_banded(400, 30, 6, seed=1)
    lay = BCOOLayout.from_csr(mat)
    x = np.random.default_rng(0).standard_normal(mat.n).astype(np.float32)
    y = np.asarray(spmv_bcoo(lay, jnp.asarray(x)))
    y_ref = mat.matvec(x)
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-6


def test_format_overheads_keys():
    mat = laplacian_2d(16)
    out = format_overheads(mat, k=3, sup_row_sizes=(4, 4))
    # Reference formulas (helpers/calculate_overhead.m:5-13).
    assert out["coo"] == 3 * mat.nnz * 4
    assert out["csr"] == (mat.m + 1 + 2 * mat.nnz) * 4
    assert out["csr2"] > out["csr"]
    assert out["csr3"] > out["csr2"]
    assert out["sell"] > 0


def test_load_balance_keys():
    mat = random_banded(600, 40, 8, seed=2)
    lb = load_balance(mat)
    assert lb["subtile_nnz"]["max"] >= lb["subtile_nnz"]["avg"]
    assert lb["num_subtiles"] > 0


def test_exact_rank_nb_banded_vs_general():
    banded = laplacian_2d(48)  # natural order: band = 48
    chunk_nb, rank_nb = exact_rank_nb(banded)
    assert rank_nb <= chunk_nb
    assert rank_nb <= 3  # k-th nonzeros cluster tightly on a stencil

    general = random_general(2000, 6, seed=3)
    _, rank_general = exact_rank_nb(general)
    assert rank_general > 3  # scattered pattern: no rank clustering


def test_tpu_plan_kernel_choice():
    # Tiny 5-point stencil: constant diagonals -> DIA wins since the
    # sell candidate pays its real per-sub-tile fixed cost (r5); any
    # slab kernel would also be correct here.
    assert tpu_plan(laplacian_2d(16)).kernel in ("dia", "sell", "packed")
    # Wide-band STENCIL (natural order, band 2048): constant diagonals
    # -> the index-free DIA kernel wins outright (round 3).
    stencil = laplacian_2d(8, 2048)
    plan = tpu_plan(stencil, assume_rcm=True)
    assert plan.kernel == "dia", (plan.kernel, plan.reason)
    # Same band structure but offsets jittered per row: hundreds of
    # distinct diagonals (DIA inadmissible), yet the k-th nonzeros of
    # neighboring rows still cluster -> aligned rank windows win.
    import numpy as np

    from tpu_spmv.formats.csr import CSRMatrix

    full = laplacian_2d(8, 2048)
    rng = np.random.default_rng(7)
    rows = np.repeat(
        np.arange(full.m, dtype=np.int64), full.row_lengths
    )
    jitter = rng.integers(-8, 9, full.nnz)
    cols = np.clip(full.indices.astype(np.int64) + jitter, 0, full.n - 1)
    broken = CSRMatrix.from_coo(
        rows, cols, np.ones(full.nnz, np.float32), full.shape
    )
    plan = tpu_plan(broken, assume_rcm=True)
    # Aligned-window family (the packed mixed-height candidate competes
    # with quantized ranked slabs since r4 — either is the right class).
    assert plan.kernel in ("ranked", "packed"), (plan.kernel, plan.reason)
    assert plan.bin_blocks == 0  # aligned windows, not binned
    # Random-within-band: no rank clustering -> binned windows beat the
    # wide plain-kernel span loop. Quantized ranked or packed-binned
    # (r5: same window family, quantum-free fill + in-kernel emit) are
    # both the right class.
    wide_random = random_banded(300_000, 1500, 8, seed=1)
    plan = tpu_plan(wide_random, assume_rcm=True)
    assert plan.kernel in ("ranked", "packed") and plan.bin_blocks > 0, (
        plan.kernel, plan.bin_blocks, plan.reason
    )
    # Fully scattered: round 1 punted to segsum at ~0.1 GF/s; the binned
    # mode bounds the gather loop regardless of structure.
    scattered = random_general(300_000, 8, seed=2)
    plan = tpu_plan(scattered, assume_rcm=True)
    assert plan.kernel in ("ranked", "packed") and plan.bin_blocks > 0, (
        plan.kernel, plan.bin_blocks, plan.reason
    )


def test_tpu_plan_sigma_recommendation():
    """Skewed row lengths (power-law-ish) -> planner recommends the
    SELL-C-sigma row sort; uniform stencils -> no recommendation."""
    import numpy as np

    from tpu_spmv.formats.csr import CSRMatrix

    assert tpu_plan(laplacian_2d(64), assume_rcm=True).sigma == 0

    rng = np.random.default_rng(0)
    m = 20_000
    lens = np.minimum((rng.pareto(1.2, m) * 3 + 1).astype(np.int64), 400)
    rows = np.repeat(np.arange(m), lens)
    cols = np.minimum(rows + rng.integers(0, 200, rows.shape[0]), m - 1)
    vals = np.ones(rows.shape[0], np.float32)
    skewed = CSRMatrix.from_coo(rows, cols, vals, (m, m))
    plan = tpu_plan(skewed, assume_rcm=True)
    assert plan.sigma > 0, (plan.sigma, plan.reason)


def test_calibration_overlay(tmp_path, monkeypatch):
    """tools/tune.py --calibrate writes per-device-kind constants that
    hw.kernel_calibration overlays onto the tune cost model."""
    import json

    from tpu_spmv.hw import device_spec, kernel_calibration
    from tpu_spmv.tools.tune import fit_affine
    from tpu_spmv.tune.model import _ranked_subtile_cost

    # Affine fit recovers known constants from exact points.
    a, b = fit_affine([(1, 4.25), (2, 5.2), (4, 7.1)])
    assert abs(a - 3.3) < 1e-6 and abs(b - 0.95) < 1e-6

    # Isolate from any REAL ~/.cache/tpu_spmv/calib.json (the on-chip
    # batch writes one) before sampling the defaults.
    monkeypatch.setenv("TPU_SPMV_CALIB", str(tmp_path / "missing.json"))
    base = _ranked_subtile_cost(4)  # pairs=2, defaults
    p = tmp_path / "calib.json"
    p.write_text(json.dumps(
        {device_spec().kind: {"ranked_fixed": 10.0, "pair_cost": 2.0}}
    ))
    monkeypatch.setenv("TPU_SPMV_CALIB", str(p))
    assert kernel_calibration() == {"ranked_fixed": 10.0, "pair_cost": 2.0}
    assert _ranked_subtile_cost(4) == 14.0
    monkeypatch.setenv("TPU_SPMV_CALIB", str(tmp_path / "missing.json"))
    assert kernel_calibration() == {}
    assert _ranked_subtile_cost(4) == base


def test_clone_layout_and_device_bytes():
    """bench_spmv_cold depends on clones being REAL copies (distinct
    buffers, identical values) and on device_bytes covering the array
    leaves of every layout family."""
    import jax
    import numpy as np

    from tpu_spmv.bench.harness import clone_layout, device_bytes
    from tpu_spmv.bench.matrices import laplacian_2d
    from tpu_spmv.formats.dia import DiaSlabs
    from tpu_spmv.formats.packed import PackedRanked
    from tpu_spmv.formats.sell import RankedSlabs

    mat = laplacian_2d(48)
    for lay in (
        RankedSlabs.from_csr(mat),
        PackedRanked.from_csr(mat),
        DiaSlabs.from_csr(mat),
    ):
        cl = clone_layout(lay)
        a = jax.tree_util.tree_leaves(lay)
        b = jax.tree_util.tree_leaves(cl)
        assert len(a) == len(b)
        for la, lb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
            assert la is not lb
        assert device_bytes(lay) == device_bytes(cl) > 0


def test_calibration_foreign_cache_does_not_shadow(tmp_path, monkeypatch):
    """A cache file calibrated on a DIFFERENT device kind must not
    shadow later candidates (review r5): kernel_calibration keeps
    looking until it finds a non-empty entry for the current kind."""
    import json

    import tpu_spmv.hw as hw

    foreign = tmp_path / "cache.json"
    foreign.write_text(json.dumps({"not-this-kind": {"ranked_fixed": 1.0}}))
    repo = tmp_path / "repo.json"
    repo.write_text(json.dumps(
        {hw.device_spec().kind: {"ranked_fixed": 7.5}}
    ))
    monkeypatch.delenv("TPU_SPMV_CALIB", raising=False)
    monkeypatch.setattr(
        "os.path.expanduser", lambda p: str(foreign)
    )
    monkeypatch.setattr(
        "os.path.join", lambda *a: str(repo)
    )
    assert hw.kernel_calibration() == {"ranked_fixed": 7.5}
