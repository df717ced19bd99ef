#!/bin/bash
# Round-4 on-chip measurement batch. Run with the axon TPU tunnel up:
#   bash results/run_r4_tpu.sh
# Stage order: the r3 stages that never produced artifacts first
# (VERDICT r3 missing #1), then refreshes. Each stage probes the tunnel
# and is independently resumable.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 180 python -c "import jax; jax.devices()" 2>/dev/null \
    || { echo "TUNNEL DOWN - aborting batch"; exit 1; }
}

probe
# 0. Contradiction repro (VERDICT r3 weak #1/#2/#5): general_500k,
#    banded_1m, lap2d packed under both protocols and both RCMs.
timeout 3600 python scratch/repro_r4.py 2>&1 | tee results/repro_r4.txt

probe
# 4d. DIA natural-order rows for the stencil matrices (f32 datum).
{ timeout 1800 python -m tpu_spmv.tools.spmv synthetic:lap2d_1024 20 \
    --kernel dia --rcm never ; \
  timeout 1800 python -m tpu_spmv.tools.spmv synthetic:lap3d_101 20 \
    --kernel dia --rcm never ; \
  timeout 1800 python -m tpu_spmv.tools.spmv synthetic:varstencil_1024 20 \
    --kernel dia --rcm never ; } \
  | tee results/dia_r4.txt

probe
# 4e. bf16 rows for the bench suite (keyed '<kernel>+bf16').
timeout 3600 python -m tpu_spmv.tools.sweep \
  --out results/sweep_bench_tpu_r4.csv --scale bench --rcm --k 1 --srs 16 \
  --kernels ranked --val-dtype bf16

probe
# 4b. SpMM datum through the public CLI.
timeout 1800 python -m tpu_spmv.tools.spmm synthetic:lap2d_1024 20 \
  --batch 8 --rcm always | tee results/spmm_r4.txt

probe
# 5. Scattered beyond the VMEM x-budget: >=16M-col matrix through the
#    column-striped kernel, one on-chip datapoint.
timeout 3600 python results/scattered_16m_r3.py \
  | tee results/scattered_16m_r4.txt

probe
# 5c. IC(0)-PCG datum (falsifiable prediction PERF_NOTES:316-329).
timeout 1800 python -m tpu_spmv.tools.solve synthetic:banded_1m \
  --iters 40 --precond ic0 --devices 1 | tee results/ic0_r4.txt

probe
# 5b. Cost-model calibration on chip (VERDICT r3 next #6).
timeout 1800 python -m tpu_spmv.tools.tune --calibrate --dry-run \
  2>results/tune_calib_r4_stderr.txt | tee results/tune_calib_r4.json

probe
# 2. Bench-scale sweep at HEAD: auto + segsum (fresh r4 CSV so the
#    rows are all one code version — the r3 CSV mixed mid-round code).
timeout 7200 python -m tpu_spmv.tools.sweep \
  --out results/sweep_bench_tpu_r4.csv --scale bench --rcm --k 1 --srs 16 \
  --kernels auto segsum

probe
# 2b. packed + dia rows in the same CSV (dia rows were free-text only
#     in r3 — VERDICT r3 next #9).
timeout 3600 python -m tpu_spmv.tools.sweep \
  --out results/sweep_bench_tpu_r4.csv --scale bench --rcm --k 1 --srs 16 \
  --kernels packed
timeout 3600 python -m tpu_spmv.tools.sweep \
  --out results/sweep_bench_tpu_r4.csv --scale bench --rcm --k 1 --srs 16 \
  --kernels bcoo
