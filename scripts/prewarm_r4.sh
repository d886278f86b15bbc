#!/bin/bash
# AOT-prewarm the round's chip executables into the persistent compile
# cache, in priority order, while the chip is busy training (compiles go to
# the remote compile service, not the device; every program here is
# lowered from shapes only). Run in the session env (axon), NOT cpu_run.
cd "$(dirname "$0")/.."
set -x

# 1. driver headline bench program (512^2, b1, exact) — the round-end gate
TAIR_BENCH_AOT_ONLY=1 python -u bench.py

# 2. quality A/B fused executables at the quality-demo size
python -u scripts/serving_quality_ab.py \
  --config configs/train_quality_demo.yaml --aot-only

# 3. sampler ladder at the quality-demo size
python -u scripts/sampler_quality_ab.py \
  --config configs/train_quality_demo.yaml \
  --samplers spaced,dpm_solver_2,edm_euler --steps-list 10,20 --aot-only
python -u scripts/sampler_quality_ab.py \
  --config configs/train_quality_demo.yaml \
  --samplers spaced --steps-list 50 --aot-only

# 4. recommended serving config + batch scaling under it (VERDICT #4)
TAIR_BENCH_AOT_ONLY=1 TAIR_BENCH_ENC_TOPK=2048 TAIR_BENCH_SPOTTER_EVERY=2 \
  python -u bench.py
TAIR_BENCH_AOT_ONLY=1 TAIR_BENCH_ENC_TOPK=2048 TAIR_BENCH_SPOTTER_EVERY=2 \
  TAIR_BENCH_BATCH=2 python -u bench.py
TAIR_BENCH_AOT_ONLY=1 TAIR_BENCH_ENC_TOPK=2048 TAIR_BENCH_SPOTTER_EVERY=2 \
  TAIR_BENCH_BATCH=4 python -u bench.py

echo "PREWARM DONE"
