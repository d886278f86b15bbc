#!/bin/bash
# Round-4 end-game: the full recorded-evidence sequence on the chip, run
# once a stage-3 weight export exists. Ordered by VERDICT r3 priority:
# serving-knob quality A/B (must-do) -> render into SERVING.md -> trained
# demo -> spotter eval + submission dump -> sampler ladder -> batch
# scaling under the sparse serving config -> bench headline (warms the
# driver's program). All fused executables AOT-prewarmed during training
# (scripts/prewarm_r4.sh, scripts/aot_train_step.py).
#
#   CKPT=runs/quality_demo/params_step_00006000.npz scripts/r4_endgame.sh
cd "$(dirname "$0")/.."
set -x

CKPT=${CKPT:-$(ls runs/quality_demo/params_step_*.npz 2>/dev/null | tail -1)}
[ -n "$CKPT" ] || { echo "ENDGAME ABORT: no params export found" >&2; exit 1; }
echo "using checkpoint $CKPT"
NIMG=${NIMG:-16}

# ADVICE r4: if train.py still holds the single chip, every eval step
# fails on device contention — fail fast instead of printing ENDGAME DONE.
if [ -f /tmp/train.pid ] && kill -0 "$(cat /tmp/train.pid)" 2>/dev/null; then
  echo "ENDGAME ABORT: train.py (pid $(cat /tmp/train.pid)) still holds the chip" >&2
  exit 1
fi

# 1. serving-knob quality A/B (the round's must-do)
python -u scripts/serving_quality_ab.py \
  --config configs/train_quality_demo.yaml --ckpt "$CKPT" \
  --num-images "$NIMG" \
  --configs exact,se2,se5,topk21,topk11,combo,hostexact,hostexact_tag \
  --out docs/measurements/serving_ab_r4.json \
  > logs/serving_ab.log 2>&1 \
  || { echo "ENDGAME ABORT: serving_quality_ab rc=$?" >&2; exit 1; }
python scripts/render_quality_docs.py

# 2. trained-model demo: whole-image val on the held-out pairs
python -u val.py --config configs/val_trained_demo.yaml \
  --ckpt "$CKPT" --image-size 256 > logs/demo_val.log 2>&1

# 3. spotter competence: held-out detection/E2E F-score + submission dump
python -u spotter_eval.py --config configs/train_quality_demo.yaml \
  --ckpt "$CKPT" --num-images "$NIMG" --score-threshold 0.3 \
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
python scripts/render_quality_docs.py

# 5. batch scaling under the recommended sparse serving config (VERDICT
#    r3 #4: "batch never helps" was only proven at exact semantics)
for B in 1 2 4; do
  TAIR_BENCH_ENC_TOPK=2048 TAIR_BENCH_SPOTTER_EVERY=2 TAIR_BENCH_BATCH=$B \
    TAIR_BENCH_REPS=3 python -u bench.py 2>>logs/batch_scaling.log \
    | tail -1 >> logs/batch_scaling_rows.jsonl
done

# 6. bench headline (exact) — also leaves the driver's program warm
python -u bench.py > logs/bench_r4.log 2>&1

echo "ENDGAME DONE"
