from tpu_spmv.formats.csr import CSRMatrix  # noqa: F401
from tpu_spmv.formats.csrk import CSRkMatrix  # noqa: F401
