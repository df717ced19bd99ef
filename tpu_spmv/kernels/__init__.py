from tpu_spmv.kernels.segsum import spmv_segsum, SegsumLayout  # noqa: F401
from tpu_spmv.kernels.pallas_sell import (  # noqa: F401
    spmv_ranked, spmv_ranked_windowed, spmv_sell,
)


def __getattr__(name):  # lazy: keep base import light
    if name in ("spmm_ranked", "spmm_ranked_windowed"):
        from tpu_spmv.kernels import spmm

        return getattr(spmm, name)
    if name == "spmv_packed":
        from tpu_spmv.kernels.packed import spmv_packed

        return spmv_packed
    if name in ("StripedRanked", "spmv_striped"):
        from tpu_spmv.kernels import striped

        return getattr(striped, name)
    if name == "spmv_dia":
        from tpu_spmv.kernels.dia import spmv_dia

        return spmv_dia
    if name == "spmv_bcoo":
        from tpu_spmv.kernels.bcoo import spmv_bcoo

        return spmv_bcoo
    raise AttributeError(name)
