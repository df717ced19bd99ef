from tpu_spmv.tune.model import reference_gpu_params, tpu_plan, TpuPlan  # noqa: F401
