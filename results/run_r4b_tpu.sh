#!/bin/bash
# Round-4b on-chip measurement batch (post pad-up/SpMM-tile/cold-harness
# session). Run with the axon TPU tunnel up:
#   bash results/run_r4b_tpu.sh
# Each stage probes the tunnel first; the sweep CSV is resumable, so
# re-running the script continues where it stopped.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 180 python -c "import jax; jax.devices()" 2>/dev/null \
    || { echo "TUNNEL DOWN - aborting batch"; exit 1; }
}

probe
# 0. On-chip calibration (the sandbox reset wiped ~/.cache between the
#    r4 batch and this session): rewrite the calib file so auto rows
#    plan with measured constants, and record the r4b fit.
timeout 1800 python -m tpu_spmv.tools.tune --calibrate \
  2>>results/tune_calib_r4b_stderr.txt | tee results/tune_calib_r4b.json

probe
# 1. Fresh single-code-version CSV: auto rows under PLANNER-decided RCM
#    (--rcm auto, new tri-state) — stencil classes stay natural-order so
#    auto can dispatch DIA; this is the "auto never loses to a manual
#    row" check the r4 CSV failed on lap2d (8.9 GF/s transient + forced
#    RCM hiding DIA).
timeout 7200 python -m tpu_spmv.tools.sweep \
  --out results/sweep_bench_tpu_r4b.csv --scale bench --rcm auto --k 1 \
  --srs 16 --kernels auto segsum

probe
# 2. Manual rows, flagship RCM config (packed rows now get the grid-tile
#    pad-up).
timeout 5400 python -m tpu_spmv.tools.sweep \
  --out results/sweep_bench_tpu_r4b.csv --scale bench --rcm --k 1 \
  --srs 16 --kernels packed ranked

probe
# 3. DIA rows, natural order, f32 + bf16.
timeout 3600 python -m tpu_spmv.tools.sweep \
  --out results/sweep_bench_tpu_r4b.csv --scale bench --k 1 --srs 16 \
  --kernels dia
probe
timeout 3600 python -m tpu_spmv.tools.sweep \
  --out results/sweep_bench_tpu_r4b.csv --scale bench --k 1 --srs 16 \
  --kernels dia --val-dtype bf16

probe
# 4. SpMM at HEAD: B-aware grid tile (306 GF/s in the A/B vs the 168.8
#    r4 artifact).
timeout 1800 python -m tpu_spmv.tools.spmm synthetic:lap2d_1024 20 \
  --batch 8 --rcm always | tee results/spmm_r4b.txt

probe
# 5. COLD-regime DIA (the r4 honesty gap: the 661 GF/s flagship is the
#    VMEM-resident solver regime; the cold single-shot bound was a
#    calculated 455 bf16 / 292 f32 — measure it).
timeout 2400 python -m tpu_spmv.tools.spmv synthetic:lap2d_1024 20 \
  --kernel dia --rcm never --cold | tee results/dia_cold_r4b.txt
probe
timeout 2400 python -m tpu_spmv.tools.spmv synthetic:lap2d_1024 20 \
  --kernel dia --rcm never --val-dtype bf16 --cold \
  | tee -a results/dia_cold_r4b.txt

probe
# 6. File-based matrices, auto rows under --rcm auto (fem3d is
#    stencil-structured: auto should now route it to DIA). The sandbox
#    reset wiped the gitignored data/ dir — regenerate (host-only,
#    deterministic seeds; same configs as the r4 batch).
mkdir -p data
[ -f data/road_2m.mtx ]     || python -m tpu_spmv.tools.gen road 2000000 --out data/road_2m.mtx
[ -f data/delaunay_1m.mtx ] || python -m tpu_spmv.tools.gen delaunay 1000000 --out data/delaunay_1m.mtx
[ -f data/fem_1m.mtx ]      || python -m tpu_spmv.tools.gen fem 1000000 --out data/fem_1m.mtx
[ -f data/fem3d_64.mtx ]    || python -m tpu_spmv.tools.gen fem3d 64 --out data/fem3d_64.mtx
timeout 10800 python -m tpu_spmv.tools.sweep \
  --out results/sweep_files_tpu_r4b.csv --rcm auto --k 1 \
  --srs 16 --matrices 'data/*.mtx' --kernels auto

probe
# 6b. Scattered-16M striped datapoint at HEAD: the 64-block stripe
#     span now runs the BLOCKED fori (_sub_loop U>1) instead of the
#     bare per-sub-tile fori — re-measure + re-validate.
timeout 3600 python results/scattered_16m_r3.py \
  | tee results/scattered_16m_r4b.txt

probe
# 7. Refresh the driver bench artifact at HEAD.
timeout 1800 python bench.py 2>results/bench_r4b_stderr.txt \
  | tee results/bench_r4b.json
