#!/bin/bash
# Round-4 end-game: runs the full recorded-evidence sequence on the chip
# the moment stage-3 training finishes. Ordered by VERDICT r3 priority:
# quality A/B (must-do) -> trained demo -> spotter eval -> sampler ladder
# -> bench headline (+ warms the driver's cache). All fused executables
# were AOT-prewarmed during training (scripts/prewarm_r4.sh).
cd "$(dirname "$0")/.."
set -x

# wait for training to complete
while kill -0 "$(cat /tmp/train.pid 2>/dev/null)" 2>/dev/null; do sleep 20; done
CKPT=$(ls runs/quality_demo/params_step_*.npz 2>/dev/null | tail -1)
[ -n "$CKPT" ] || { echo "ENDGAME ABORT: no params export found" >&2; exit 1; }
echo "using checkpoint $CKPT"

# 1. serving-knob quality A/B (the round's must-do)
python -u scripts/serving_quality_ab.py \
  --config configs/train_quality_demo.yaml --ckpt "$CKPT" \
  --num-images 16 \
  --configs exact,se2,se5,topk21,topk11,combo,hostexact,hostexact_tag \
  --out docs/measurements/serving_ab_r4.json \
  > logs/serving_ab.log 2>&1

# 2. trained-model demo: whole-image val on the held-out pairs
python -u val.py --config configs/val_trained_demo.yaml \
  --ckpt "$CKPT" --image-size 256 > logs/demo_val.log 2>&1

# 3. spotter competence: held-out detection/E2E F-score + submission dump
python -u spotter_eval.py --config configs/train_quality_demo.yaml \
  --ckpt "$CKPT" --num-images 16 --score-threshold 0.3 \
  --dump-dir results/spotter_submission \
  > logs/spotter_eval.log 2>&1

# 4. sampler step-count ladder
python -u scripts/sampler_quality_ab.py \
  --config configs/train_quality_demo.yaml --ckpt "$CKPT" \
  --samplers spaced,dpm_solver_2,edm_euler --steps-list 10,20 \
  --num-images 8 --out docs/measurements/sampler_ab_r4.json \
  > logs/sampler_ab.log 2>&1
python -u scripts/sampler_quality_ab.py \
  --config configs/train_quality_demo.yaml --ckpt "$CKPT" \
  --samplers spaced --steps-list 50 \
  --num-images 8 --out docs/measurements/sampler_ab_r4_s50.json \
  >> logs/sampler_ab.log 2>&1

# 5. bench headline (exact) — also leaves the driver's program warm
python -u bench.py > logs/bench_r4.log 2>&1

echo "ENDGAME DONE"
