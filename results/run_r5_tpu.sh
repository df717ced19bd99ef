#!/bin/bash
# Round-5 on-chip measurement batch (packed-binned irregular mode, u8
# lcols, epilogue-aware planner, cold K=6x). Run with the tunnel up:
#   bash results/run_r5_tpu.sh
# Sweeps are resumable; re-running continues where it stopped.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 180 python -c "import jax; jax.devices()" 2>/dev/null \
    || { echo "TUNNEL DOWN - aborting batch"; exit 1; }
}

probe
# 1. Bench-suite auto rows (planner now routes fem/delaunay classes to
#    packed-binned and charges ragged candidates the segment-sum
#    epilogue) + segsum baseline.
timeout 7200 python -m tpu_spmv.tools.sweep \
  --out results/sweep_bench_tpu_r5.csv --scale bench --rcm auto --k 1 \
  --srs 16 --kernels auto segsum

probe
# 2. File matrices: the reference's benchmark classes. Target: every
#    row wrong=0 (magnitude-aware tolerance) and >= the r4b GF/s.
mkdir -p data
[ -f data/road_2m.mtx ]     || python -m tpu_spmv.tools.gen road 2000000 --out data/road_2m.mtx
[ -f data/delaunay_1m.mtx ] || python -m tpu_spmv.tools.gen delaunay 1000000 --out data/delaunay_1m.mtx
[ -f data/fem_1m.mtx ]      || python -m tpu_spmv.tools.gen fem 1000000 --out data/fem_1m.mtx
[ -f data/fem3d_64.mtx ]    || python -m tpu_spmv.tools.gen fem3d 64 --out data/fem3d_64.mtx
timeout 10800 python -m tpu_spmv.tools.sweep \
  --out results/sweep_files_tpu_r5.csv --rcm auto --k 1 \
  --srs 16 --matrices 'data/*.mtx' --kernels auto

probe
# 2b. File matrices, bf16 auto rows (fem_1m best measured config).
timeout 7200 python -m tpu_spmv.tools.sweep \
  --out results/sweep_files_tpu_r5.csv --rcm auto --k 1 \
  --srs 16 --matrices 'data/fem_1m.mtx' 'data/delaunay_1m.mtx' \
  --kernels ranked packed --val-dtype bf16

probe
# 3. COLD-regime DIA re-run at K=6x VMEM (r4b's K=2x read 126-129% of
#    roofline — VERDICT r4 weak #4; the working set must defeat any
#    VMEM residency).
timeout 2400 python -m tpu_spmv.tools.spmv synthetic:lap2d_1024 20 \
  --kernel dia --rcm never --cold | tee results/dia_cold_r5.txt
probe
timeout 2400 python -m tpu_spmv.tools.spmv synthetic:lap2d_1024 20 \
  --kernel dia --rcm never --val-dtype bf16 --cold \
  | tee -a results/dia_cold_r5.txt

probe
# 4. SpMM B-sweep decomposition (floor analysis, VERDICT r4 weak #7).
timeout 3600 bash scratch/run_with_retry.sh scratch/r5_chip_batch2.py \
  /tmp/batch2spmm.log spmm && cp /tmp/batch2spmm.log results/spmm_bsweep_r5.txt

probe
# 5. Scattered classes: sigma engagement + packed-binned (floor doc).
timeout 3600 bash scratch/run_with_retry.sh scratch/r5_chip_batch2.py \
  /tmp/batch2scat.log scattered && cp /tmp/batch2scat.log results/scattered_r5.txt

probe
# 6. Weak-scaling compute anchor (single-chip shard ladder).
timeout 3600 bash scratch/run_with_retry.sh scratch/r5_chip_batch2.py \
  /tmp/batch2anchor.log anchor && cp /tmp/batch2anchor.log results/scaling_anchor_r5.txt

probe
# 7. Driver bench artifact at HEAD.
timeout 1800 python bench.py 2>results/bench_r5_stderr.txt \
  | tee results/bench_r5.json
