from tpu_spmv.kernels.segsum import spmv_segsum, SegsumLayout  # noqa: F401
