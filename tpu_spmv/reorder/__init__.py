from tpu_spmv.reorder.rcm import rcm, cuthill_mckee, bandwidth  # noqa: F401
from tpu_spmv.reorder.coarsen import hand_coarsen, matching_coarsen  # noqa: F401
from tpu_spmv.reorder.compose import uncoarsen_compose  # noqa: F401
