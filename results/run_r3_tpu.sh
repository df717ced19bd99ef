#!/bin/bash
# Round-3 on-chip measurement batch. Run with the axon TPU tunnel up:
#   bash results/run_r3_tpu.sh
# Each stage is independent and appends/overwrites its own artifact, so
# a tunnel drop mid-run loses only the current stage (the sweep CSV is
# resumable by design). Before each stage a quick device probe aborts
# the batch (exit 1) if the tunnel has dropped — the caller can retry
# later and finished stages re-run cheaply or resume.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 180 python -c "import jax; jax.devices()" 2>/dev/null \
    || { echo "TUNNEL DOWN - aborting batch"; exit 1; }
}

probe
# 1. Flagship bench (ranked vs packed head-to-head; prints one JSON line).
timeout 1800 python bench.py 2>results/bench_r3_stderr.txt \
  | tee results/bench_r3.json

probe
# 2. Bench-scale sweep, auto-planned kernels (sigma + striped/dia/binned
#    routing all engaged) + the segsum baseline.
timeout 5400 python -m tpu_spmv.tools.sweep \
  --out results/sweep_bench_tpu_r3.csv --scale bench --rcm --k 1 --srs 16 \
  --kernels auto segsum

probe
# 3. BCOO vendor datum (VERDICT r2 #8): jax.experimental.sparse rows for
#    the same suite — slow is fine, that IS the datum.
timeout 5400 python -m tpu_spmv.tools.sweep \
  --out results/sweep_bench_tpu_r3.csv --scale bench --rcm --k 1 --srs 16 \
  --kernels bcoo

probe
# 4. Packed mixed-height rows for the regular suite (roofline lever).
timeout 3600 python -m tpu_spmv.tools.sweep \
  --out results/sweep_bench_tpu_r3.csv --scale bench --rcm --k 1 --srs 16 \
  --kernels packed

probe
# 4c. bf16 value-storage datum (net-new opt-in; validated against the
#     bf16-rounded operator, drift vs f32 printed). The bench.py
#     candidate covers the head-to-head; this records the CLI artifact.
{ timeout 1800 python -m tpu_spmv.tools.spmv synthetic:lap2d_1024 20 \
    --kernel packed --val-dtype bf16 --rcm always ; \
  timeout 1800 python -m tpu_spmv.tools.spmv synthetic:lap2d_1024 20 \
    --kernel ranked --val-dtype bf16 --rcm always ; \
  timeout 1800 python -m tpu_spmv.tools.spmv synthetic:lap2d_1024 20 \
    --kernel dia --val-dtype bf16 --rcm never ; } \
  | tee results/bf16_r3.txt

probe
# 4e. bf16 rows for the bench suite (keyed '<kernel>+bf16' in the same
#     CSV; validated against the bf16-rounded operator).
timeout 3600 python -m tpu_spmv.tools.sweep \
  --out results/sweep_bench_tpu_r3.csv --scale bench --rcm --k 1 --srs 16 \
  --kernels ranked --val-dtype bf16

probe
# 4d. DIA natural-order rows for the stencil matrices (f32 datum; the
#     bf16 stage above records the reduced-traffic variant).
{ timeout 1800 python -m tpu_spmv.tools.spmv synthetic:lap2d_1024 20 \
    --kernel dia --rcm never ; \
  timeout 1800 python -m tpu_spmv.tools.spmv synthetic:lap3d_101 20 \
    --kernel dia --rcm never ; \
  timeout 1800 python -m tpu_spmv.tools.spmv synthetic:varstencil_1024 20 \
    --kernel dia --rcm never ; } \
  | tee results/dia_r3.txt

probe
# 4b. SpMM datum through the public CLI (was a scratch script in r2).
timeout 1800 python -m tpu_spmv.tools.spmm synthetic:lap2d_1024 20 \
  --batch 8 --rcm always | tee results/spmm_r3.txt

probe
# 5. Scattered beyond the VMEM x-budget: >=16M-col matrix through the
#    column-striped kernel (VERDICT r2 #4), one on-chip datapoint.
timeout 3600 python results/scattered_16m_r3.py \
  | tee results/scattered_16m_r3.txt

probe
# 5c. IC(0)-PCG datum: the triangular-solve kernels in production —
#     one SpMV + two chunk-sequential solves per jitted iteration.
timeout 1800 python -m tpu_spmv.tools.solve synthetic:banded_1m \
  --iters 40 --precond ic0 --devices 1 | tee results/ic0_r3.txt

probe
# 5b. Cost-model calibration datum (dry-run: record the on-chip fit
#     without overlaying mid-batch; v5e should reproduce the defaults).
timeout 1800 python -m tpu_spmv.tools.tune --calibrate --dry-run \
  2>results/tune_calib_r3_stderr.txt | tee results/tune_calib_r3.json

# 6. Weak scaling D=1..8 (simulated mesh; forces CPU itself, no probe).
timeout 1800 python -m tpu_spmv.tools.scaling --weak \
  --out results/weak_scaling_r3.csv
