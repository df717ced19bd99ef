"""IC(0) incomplete Cholesky + preconditioned CG (sts/ic0.py).

The reference's incomplete_choloskey is structural-only and its STS
driver is disabled (spmv-csrk/spmv.cpp:219-234); the numeric factor and
the jitted PCG loop are net-new, and they are the production consumer
of the chunk-sequential triangular-solve kernels.
"""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from scipy.sparse.linalg import spsolve_triangular

from tpu_spmv.bench.matrices import laplacian_2d, random_banded
from tpu_spmv.sts.host import split_lu
from tpu_spmv.sts.ic0 import (
    IC0Preconditioner, _ic0_numpy, ic0_factor, pcg_ic0_solve,
)


def test_ic0_native_numpy_parity_and_pattern():
    import pytest

    from tpu_spmv.reorder import native

    if not native.available():
        pytest.skip("native core unavailable; parity would be vacuous")
    mat = random_banded(800, 40, 8, seed=3)
    L, bad = ic0_factor(mat)  # native path (available() checked above)
    assert bad == 0  # diagonally dominant SPD: no pivot shifts
    lower, _ = split_lu(mat)
    vals_np, bad_np = _ic0_numpy(lower.indptr, lower.indices, lower.data)
    assert bad_np == 0
    assert np.array_equal(np.asarray(L.data), vals_np)  # bit-exact parity
    # Defining property of IC(0): L L^T == A on A's sparsity pattern.
    Ls = L.to_scipy().astype(np.float64)
    A = mat.to_scipy().astype(np.float64)
    pat = A.copy()
    pat.data[:] = 1.0
    diff = (Ls @ Ls.T).tocsr().multiply(pat) - A
    assert abs(diff).max() < 1e-5


def test_ic0_breakdown_shift_is_counted():
    """An indefinite 'SPD-shaped' matrix must not crash: nonpositive
    pivots are shifted and counted."""
    mat = random_banded(300, 20, 6, seed=1, diagonally_dominant=False)
    L, bad = ic0_factor(mat)
    assert bad > 0
    assert np.isfinite(np.asarray(L.data)).all()
    diag = L.data[L.indptr[1:].astype(np.int64) - 1]
    assert (diag > 0).all()


def test_ic0_apply_matches_scipy_two_solves():
    mat = random_banded(700, 30, 8, seed=5)
    pre = IC0Preconditioner.build(mat)
    assert pre.breakdowns == 0
    L, _ = ic0_factor(mat)
    Ls = L.to_scipy().astype(np.float64)
    r = np.random.default_rng(0).standard_normal(mat.m).astype(np.float32)
    y = spsolve_triangular(Ls.tocsr(), r.astype(np.float64), lower=True)
    z_ref = spsolve_triangular(sp.csr_matrix(Ls.T), y, lower=False)
    z = np.asarray(pre.apply(jnp.asarray(r), interpret=True))
    assert np.linalg.norm(z - z_ref) / np.linalg.norm(z_ref) < 1e-6


def test_pcg_ic0_beats_plain_cg():
    """On the Laplacian (the slow-CG class) IC(0) must cut the residual
    by orders of magnitude at equal iteration count."""
    from tpu_spmv.formats.sell import RankedSlabs
    from tpu_spmv.kernels.pallas_sell import spmv_ranked
    from tpu_spmv.reorder.rcm import rcm

    mat = laplacian_2d(48)
    mat = mat.permuted(rcm(mat.indptr, mat.indices))
    lay = RankedSlabs.from_csr(mat)
    b = np.ones(mat.m, np.float32)
    bj = jnp.asarray(b)

    pre = IC0Preconditioner.build(mat)
    x, _ = pcg_ic0_solve(lay, bj, pre, iters=30, interpret=True)
    res_ic0 = np.linalg.norm(mat.matvec(np.asarray(x)) - b)

    x = jnp.zeros_like(bj)
    r = p = bj
    rz = jnp.vdot(r, r)
    for _ in range(30):
        Ap = spmv_ranked(lay, p, interpret=True)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rz2 = jnp.vdot(r, r)
        p = r + (rz2 / rz) * p
        rz = rz2
    res_cg = np.linalg.norm(mat.matvec(np.asarray(x)) - b)
    assert res_ic0 < res_cg / 100


def test_solve_cli_ic0(capsys):
    from tpu_spmv.tools import solve

    rc = solve.main([
        "synthetic:banded_1k", "--iters", "25", "--precond", "ic0",
        "--devices", "1",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "breakdowns=0" in out


def test_pcg_ic0_sharded_matches_single_chip():
    """Distributed exact IC(0): two block back-substitution chains per
    iteration; must converge like the single-chip PCG."""
    import jax
    import pytest

    from tpu_spmv.dist.sharding import (
        ShardedRanked, make_row_mesh, shard_vector,
    )
    from tpu_spmv.reorder.rcm import rcm
    from tpu_spmv.sts.ic0 import ShardedIC0Preconditioner, pcg_ic0_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mat = random_banded(3000, 50, 8, seed=2)
    mat = mat.permuted(rcm(mat.indptr, mat.indices))
    D = 4
    mesh = make_row_mesh(jax.devices()[:D])
    lay = ShardedRanked.build(mat, D).device_put(mesh)
    pre = ShardedIC0Preconditioner.build(mat, D, lay.padded_m)
    assert pre.breakdowns == 0
    b = np.ones(mat.m, np.float32)
    bp = np.zeros(lay.padded_m, np.float32)
    bp[: mat.m] = b
    x, _ = pcg_ic0_sharded(lay, shard_vector(bp, mesh), pre, mesh, iters=25)
    x = np.asarray(x)[: mat.m]
    resid = np.linalg.norm(mat.matvec(x) - b) / np.sqrt(mat.m)
    assert resid < 1e-5


def test_solve_cli_ic0_distributed(capsys):
    import jax
    import pytest

    from tpu_spmv.tools import solve

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    rc = solve.main([
        "synthetic:banded_1k", "--iters", "25", "--precond", "ic0",
        "--devices", "4",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "distributed, D=4" in out
