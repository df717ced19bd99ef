"""jax.experimental.sparse BCOO baseline.

Second vendor-library-role datum beside the segment-sum baseline: the
reference benchmarks its CSR-k kernels against MKL (mkl-spmv/spmv.cpp:
132-160), cuSPARSE (cusparse-spmv/spmv.cu:153-190), hipSPARSE and
KokkosKernels; on TPU the closest "vendor" sparse path is JAX's own
BCOO matrix-vector product, which XLA lowers to gather/scatter ops.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_spmv.formats.csr import CSRMatrix


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BCOOLayout:
    """Wrapper holding a jax.experimental.sparse.BCOO matrix."""

    mat: object  # sparse.BCOO
    m: int
    n: int
    nnz: int

    def tree_flatten(self):
        return (self.mat,), (self.m, self.n, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @classmethod
    def from_csr(cls, csr: CSRMatrix) -> "BCOOLayout":
        from jax.experimental import sparse

        rows = np.repeat(np.arange(csr.m, dtype=np.int32), csr.row_lengths)
        indices = np.stack([rows, csr.indices.astype(np.int32)], axis=1)
        mat = sparse.BCOO(
            (jnp.asarray(csr.data), jnp.asarray(indices)),
            shape=csr.shape,
            indices_sorted=True,
            unique_indices=True,
        )
        return cls(mat=mat, m=csr.m, n=csr.n, nnz=csr.nnz)


@jax.jit
def spmv_bcoo(layout: BCOOLayout, x: jax.Array) -> jax.Array:
    """y = A @ x via the library BCOO matvec."""
    return layout.mat @ x
