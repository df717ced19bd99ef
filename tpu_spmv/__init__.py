"""tpu_spmv — a TPU-native sparse matrix-vector multiplication framework.

Built from scratch in JAX/XLA/Pallas with a C++ host preprocessing core,
providing the capabilities of the reference research suite
``computablee/heterogeneous-spmv`` (see SURVEY.md): MatrixMarket / .csr
ingestion, RCM bandwidth reduction, multilevel CSR-k construction by graph
coarsening, density-model autotuning, Pallas SpMV kernels, a benchmark
harness with serial-oracle validation, and multi-chip scaling over a
``jax.sharding.Mesh``.

Layer map (TPU-first, not a translation):

    io/       MatrixMarket + .csr/.csr2/.csr3 text formats (reference-compatible)
    formats/  host-side CSR / CSR-k matrices and the TPU device layouts
    reorder/  RCM, graph coarsening, permutation composition (C++ core + NumPy)
    kernels/  Pallas SpMV kernels + pure-XLA baselines
    tune/     density-model parameter selection + sweep autotuner
    dist/     mesh row-sharding, halo exchange, distributed solvers
    bench/    timing/validation harness, synthetic matrix generators, CSV logs
    tools/    CLI entry points (convert, reformat, stats, spmv, sweep)
"""

__version__ = "0.1.0"

from tpu_spmv.formats.csr import CSRMatrix  # noqa: F401
