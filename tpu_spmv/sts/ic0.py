"""IC(0)-preconditioned CG: the triangular-solve kernels in production.

The reference's `incomplete_choloskey` (csrk.cpp:708-789) splits the
nonzero STRUCTURE only and its STS driver is disabled; this module adds
the numeric incomplete Cholesky factorization IC(0) (values on the
lower-triangular pattern, no fill) and applies M^-1 = (L L^T)^-1 inside
a fully jitted PCG loop — each application is one forward solve on L
and one backward solve on L^T, both running the chunk-sequential Pallas
solve kernel (sts/solve.py). This is the workload the STS subsystem
exists for: two triangular solves per CG iteration, on device, with no
host round trips inside the loop.

Factorization runs in the native core (cpp/reorder.cc tpu_spmv_ic0,
O(sum of row-length^2) two-pointer row dots) with an exact-parity NumPy
fallback. The backward solve reuses the row+column reversal
(sts/host.reversed_for_upper); both solve systems are built with the LS
order and sort_packs=False, which provably preserves a triangular
input's structure (tests/test_sts.py::test_upper_solve_scipy_parity).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_spmv.formats.csr import CSRMatrix
from tpu_spmv.sts.host import build_sts, reversed_for_upper, split_lu
from tpu_spmv.sts.solve import LowerSolveLayout, lower_solve


def _ic0_numpy(indptr, indices, data):
    """NumPy IC(0), exact-parity with cpp/reorder.cc tpu_spmv_ic0
    (f32 storage, f64 accumulation, same breakdown shift)."""
    m = indptr.shape[0] - 1
    out = np.array(data, dtype=np.float32, copy=True)
    bad = 0
    for i in range(m):
        i0, i1 = int(indptr[i]), int(indptr[i + 1])
        if i1 <= i0 or indices[i1 - 1] != i:
            raise ValueError(f"row {i}: diagonal must be the last entry")
        for idx in range(i0, i1 - 1):
            k = int(indices[idx])
            s = float(out[idx])
            a, b = i0, int(indptr[k])
            aend, bend = idx, int(indptr[k + 1]) - 1
            while a < aend and b < bend:
                ca, cb = indices[a], indices[b]
                if ca == cb:
                    s -= float(out[a]) * float(out[b])
                    a += 1
                    b += 1
                elif ca < cb:
                    a += 1
                else:
                    b += 1
            out[idx] = np.float32(s / float(out[indptr[k + 1] - 1]))
        s = float(out[i1 - 1])
        for idx in range(i0, i1 - 1):
            s -= float(out[idx]) ** 2
        if not s > 0.0:
            floor_ = max(1e-8 * abs(float(out[i1 - 1])), 1e-8)
            s = max(abs(s), floor_)
            bad += 1
        out[i1 - 1] = np.float32(np.sqrt(s))
    return out, bad


def ic0_factor(mat: CSRMatrix) -> tuple[CSRMatrix, int]:
    """IC(0) factor L (lower, diagonal included) of a symmetric
    positive-definite matrix, on the lower pattern of `mat`. Returns
    (L, breakdown count — 0 for diagonally dominant SPD inputs)."""
    lower, _ = split_lu(mat)
    from tpu_spmv.reorder import native

    if native.available():
        # A native failure here is a real error (malformed structure),
        # not a cue to silently crawl through the pure-Python loop.
        vals, bad = native.ic0(lower.indptr, lower.indices, lower.data)
    else:
        vals, bad = _ic0_numpy(lower.indptr, lower.indices, lower.data)
    return CSRMatrix(lower.indptr, lower.indices, vals, lower.shape), bad


def _build_ic0_systems(mat: CSRMatrix):
    """Factor + the two solve systems both preconditioners share.

    Returns (L, breakdowns, sys_l, inv_l, rev, sys_u, inv_u). Both
    systems use LS order with sort_packs=False — the combination that
    provably preserves a triangular input's structure (build_sts splits
    AFTER permuting; see tests/test_sts.py::test_upper_solve_scipy_
    parity) — and the composed index maps downstream depend on exactly
    these invariants."""
    import scipy.sparse as sp

    L, bad = ic0_factor(mat)
    sys_l = build_sts(L, order_type="LS", sort_packs=False)
    assert sys_l.lower.nnz == L.nnz
    inv_l = np.argsort(sys_l.perm)

    U = CSRMatrix.from_scipy(sp.csr_matrix(L.to_scipy().T))
    mat_ru, rev = reversed_for_upper(U)
    sys_u = build_sts(mat_ru, order_type="LS", sort_packs=False)
    assert sys_u.lower.nnz == U.nnz
    inv_u = np.argsort(sys_u.perm)
    return L, bad, sys_l, inv_l, rev, sys_u, inv_u


def _scatter_b(layout: LowerSolveLayout, b: jax.Array) -> jax.Array:
    """b (m,) in the layout's system order -> scaled padded blocks."""
    flat = jnp.zeros(layout.inv_diag.size, jnp.float32).at[
        layout.pad_index
    ].set(b)
    return flat.reshape(layout.inv_diag.shape) * layout.inv_diag


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class IC0Preconditioner:
    """Jit-ready application of M^-1 = (L L^T)^-1.

    lay_l / lay_u: chunk-sequential solve layouts for L and for the
    reversed L^T (a lower system again — sts/host.reversed_for_upper).
    idx0/idx1/idx2: composed gather maps threading the two systems'
    permutations: r -> b_L, y_sys -> b_U, x_sys -> z.
    """

    lay_l: LowerSolveLayout
    lay_u: LowerSolveLayout
    idx0: jax.Array
    idx1: jax.Array
    idx2: jax.Array
    breakdowns: int = 0

    def tree_flatten(self):
        return (
            (self.lay_l, self.lay_u, self.idx0, self.idx1, self.idx2),
            (self.breakdowns,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def build(cls, mat: CSRMatrix) -> "IC0Preconditioner":
        L, bad, sys_l, inv_l, rev, sys_u, inv_u = _build_ic0_systems(mat)
        b_dummy = np.zeros(L.m, np.float32)
        lay_l = LowerSolveLayout.build(sys_l, b_dummy)
        lay_u = LowerSolveLayout.build(sys_u, b_dummy)

        return cls(
            lay_l=lay_l,
            lay_u=lay_u,
            idx0=jnp.asarray(sys_l.perm, jnp.int32),
            idx1=jnp.asarray(inv_l[rev[sys_u.perm]], jnp.int32),
            idx2=jnp.asarray(inv_u[rev], jnp.int32),
            breakdowns=bad,
        )

    def apply(self, r: jax.Array, interpret: bool = False) -> jax.Array:
        """z = (L L^T)^-1 r, all on device (two Pallas solves)."""
        y_sys = lower_solve(
            self.lay_l, b_scale=_scatter_b(self.lay_l, r[self.idx0]),
            interpret=interpret,
        )
        x_sys = lower_solve(
            self.lay_u, b_scale=_scatter_b(self.lay_u, y_sys[self.idx1]),
            interpret=interpret,
        )
        return x_sys[self.idx2]


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("iters", "interpret"))
def _pcg_ic0_run(layout, precond, b, iters, interpret):
    from tpu_spmv.kernels.pallas_sell import spmv_ranked

    def step(i, state):
        del i
        x, r, p, rz = state
        Ap = spmv_ranked(layout, p, interpret=interpret)
        alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond.apply(r, interpret=interpret)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, p, rz_new)

    x0 = jnp.zeros_like(b)
    z0 = precond.apply(b, interpret=interpret)
    state = (x0, b, z0, jnp.vdot(b, z0))
    state = jax.lax.fori_loop(0, iters, step, state)
    return state[0], state[3]


def pcg_ic0_solve(
    layout, b: jax.Array, precond: IC0Preconditioner, iters: int = 50,
    interpret: bool = False,
):
    """Single-chip PCG with the IC(0) preconditioner: one rank-windowed
    SpMV + two chunk-sequential triangular solves per iteration, the
    whole loop jitted (compile cached at module level — repeated solves
    with the same shapes reuse it). Returns (x, final r.z)."""
    return _pcg_ic0_run(layout, precond, b, iters, interpret)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedIC0Preconditioner:
    """Distributed exact IC(0): M^-1 r by two block back-substitution
    chains (dist/sts.py) per application. The chains are the inherent
    cost of an exact distributed triangular solve (each shard waits on
    its predecessors); the five index maps thread the A-space
    row-sharded vectors through the two solve systems' pack paddings
    and permutations exactly as in the single-chip IC0Preconditioner.
    """

    lay_l: object  # ShardedLowerSolve for L
    lay_u: object  # ShardedLowerSolve for reversed L^T
    bl_gather: jax.Array  # r[bl_gather] -> rows of L's rhs (m,)
    bl_scatter: jax.Array  # ... scattered to b_L_pad positions (m,)
    bu_gather: jax.Array  # x_L_pad[bu_gather] -> rows of U's rhs (m,)
    bu_scatter: jax.Array  # ... scattered to b_U_pad positions (m,)
    z_gather: jax.Array  # x_U_pad[z_gather] -> z rows (m,)
    m: int
    padded_m_a: int  # the SpMV layout's padded length (z re-padding)
    breakdowns: int = 0

    def tree_flatten(self):
        return (
            (self.lay_l, self.lay_u, self.bl_gather, self.bl_scatter,
             self.bu_gather, self.bu_scatter, self.z_gather),
            (self.m, self.padded_m_a, self.breakdowns),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def build(
        cls, mat: CSRMatrix, n_devices: int, padded_m_a: int,
    ) -> "ShardedIC0Preconditioner":
        from tpu_spmv.dist.sts import ShardedLowerSolve

        L, bad, sys_l, inv_l, rev, sys_u, inv_u = _build_ic0_systems(mat)
        m = L.m
        zeros = np.zeros(m, np.float32)
        lay_l, pad_l = ShardedLowerSolve.build(sys_l, zeros, n_devices)
        lay_u, pad_u = ShardedLowerSolve.build(sys_u, zeros, n_devices)

        i32 = lambda a: jnp.asarray(a, jnp.int32)
        return cls(
            lay_l=lay_l,
            lay_u=lay_u,
            # b_L_pad[pad_l[t]] = r[perm_l[t]]
            bl_gather=i32(sys_l.perm),
            bl_scatter=i32(pad_l),
            # b_U_pad[pad_u[t]] = y[rev[perm_u[t]]]
            #                   = x_L_pad[pad_l[inv_l[rev[perm_u[t]]]]]
            bu_gather=i32(pad_l[inv_l[rev[sys_u.perm]]]),
            bu_scatter=i32(pad_u),
            # z[j] = x_U_pad[pad_u[inv_u[rev[j]]]]
            z_gather=i32(pad_u[inv_u[rev]]),
            m=m,
            padded_m_a=padded_m_a,
            breakdowns=bad,
        )

    def apply(self, r: jax.Array, mesh, axis="rows",
              interpret: bool | None = None) -> jax.Array:
        """z = (L L^T)^-1 r. r: (padded_m_a,) row-sharded in A coords;
        returns z with the same length (rows beyond m are zero)."""
        from tpu_spmv.dist.sts import sts_solve_sharded

        b_l = jnp.zeros(self.lay_l.padded_m, jnp.float32).at[
            self.bl_scatter
        ].set(r[self.bl_gather])
        x_l = sts_solve_sharded(
            self.lay_l, mesh, axis, interpret=interpret, b=b_l
        )
        b_u = jnp.zeros(self.lay_u.padded_m, jnp.float32).at[
            self.bu_scatter
        ].set(x_l[self.bu_gather])
        x_u = sts_solve_sharded(
            self.lay_u, mesh, axis, interpret=interpret, b=b_u
        )
        return jnp.zeros(self.padded_m_a, jnp.float32).at[
            jnp.arange(self.m)
        ].set(x_u[self.z_gather])


@_partial(
    jax.jit, static_argnames=("mesh", "axis", "iters", "interpret")
)
def _pcg_ic0_sharded_run(layout, precond, b, mesh, axis, iters, interpret):
    from tpu_spmv.dist.sharding import spmv_sharded

    def step(i, state):
        del i
        x, r, p, rz = state
        Ap = spmv_sharded(layout, p, mesh, axis, interpret=interpret)
        alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond.apply(r, mesh, axis, interpret=interpret)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, p, rz_new)

    x0 = jnp.zeros_like(b)
    z0 = precond.apply(b, mesh, axis, interpret=interpret)
    state = (x0, b, z0, jnp.vdot(b, z0))
    state = jax.lax.fori_loop(0, iters, step, state)
    return state[0], state[3]


def pcg_ic0_sharded(
    layout, b: jax.Array, precond, mesh, axis="rows", iters: int = 50,
    interpret: bool | None = None,
):
    """Distributed PCG with the exact IC(0) preconditioner: per jitted
    iteration one sharded SpMV (halo exchange) and two block
    back-substitution chains. Compile cached at module level (mesh and
    axis ride as static jit args). Returns (x, final r.z)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    axis = axis if isinstance(axis, str) else tuple(axis)
    return _pcg_ic0_sharded_run(
        layout, precond, b, mesh, axis, iters, interpret
    )


__all__ = [
    "IC0Preconditioner", "ShardedIC0Preconditioner", "ic0_factor",
    "pcg_ic0_solve", "pcg_ic0_sharded",
]
