#!/bin/bash
# Round-5 end-game: recorded quality evidence from the stage-2-competent
# spotter checkpoint. Unlike r4 (never ran), this version (a) has a SMALL
# preset that runs mid-round after the first chain segment, (b) commits
# after EVERY stage so a partial run still lands evidence, (c) fails fast
# on device contention or a failing stage (ADVICE r4).
#
#   SMALL=1 scripts/r5_endgame.sh          # 4 configs x 4 images, early
#   scripts/r5_endgame.sh                  # full 8 configs x 16 images
#   CKPT=... THRESH=0.2 scripts/r5_endgame.sh
cd "$(dirname "$0")/.."
set -x

CKPT=${CKPT:-$(ls runs/spotter_demo/params_step_*.npz 2>/dev/null | tail -1)}
[ -n "$CKPT" ] || CKPT=$(ls runs/quality_demo/params_step_*.npz 2>/dev/null | tail -1)
[ -n "$CKPT" ] || { echo "ENDGAME ABORT: no params export found" >&2; exit 1; }
echo "using checkpoint $CKPT"

# the in-env demo checkpoint is under-confident vs the reference's 0.5
# (docs/measurements/spotter_diag_*.json); 0.2 is the measured knee
THRESH=${THRESH:-0.2}
if [ "${SMALL:-0}" = "1" ]; then
  NIMG=${NIMG:-4}; CONFIGS=${CONFIGS:-exact,se2,topk21,combo}
  TAG=r5small
else
  NIMG=${NIMG:-16}
  CONFIGS=${CONFIGS:-exact,se2,se5,topk21,topk11,combo,hostexact,hostexact_tag}
  TAG=r5
fi

# fail fast if the training chain still holds the single chip
for pidfile in /tmp/chain.pid /tmp/train.pid; do
  if [ -f "$pidfile" ] && kill -0 "$(cat "$pidfile")" 2>/dev/null; then
    echo "ENDGAME ABORT: $(cat "$pidfile") ($pidfile) still holds the chip" >&2
    exit 1
  fi
done

commit() {
  git add -A docs/measurements docs/SERVING.md logs results 2>/dev/null
  git commit -q -m "$1" || echo "commit made no changes: $1" >&2
}

# 1. serving-knob quality A/B (two rounds' standing must-do)
python -u scripts/serving_quality_ab.py \
  --config configs/train_quality_demo.yaml --ckpt "$CKPT" \
  --num-images "$NIMG" --score-threshold "$THRESH" \
  --configs "$CONFIGS" \
  --out "docs/measurements/serving_ab_${TAG}.json" \
  > "logs/serving_ab_${TAG}.log" 2>&1 \
  || { echo "ENDGAME ABORT: serving_quality_ab rc=$?" >&2; exit 1; }
python scripts/render_quality_docs.py
commit "Serving-knob quality A/B (${TAG}): measured PSNR/SSIM/F cost of spotter_every and enc_topk"

# 2. spotter competence: held-out detection/E2E F-score + submission dump
python -u spotter_eval.py --config configs/train_quality_demo.yaml \
  --ckpt "$CKPT" --num-images 16 --score-threshold "$THRESH" \
  --dump-dir results/spotter_submission \
  > "logs/spotter_eval_${TAG}.log" 2>&1
tail -1 "logs/spotter_eval_${TAG}.log" > "docs/measurements/spotter_eval_${TAG}.json" || true
commit "Held-out spotter eval (${TAG}): det/E2E F at threshold ${THRESH} + RRC/COCO submission dump"

if [ "${SMALL:-0}" != "1" ]; then
  # 3. trained-model demo: whole-image val on the held-out pairs
  python -u val.py --config configs/val_trained_demo.yaml \
    --ckpt "$CKPT" --image-size 256 > logs/demo_val.log 2>&1
  commit "Trained-model demo: val.py restorations + pred-text panels on held-out pairs"

  # 4. sampler step-count ladder
  python -u scripts/sampler_quality_ab.py \
    --config configs/train_quality_demo.yaml --ckpt "$CKPT" \
    --samplers spaced,dpm_solver_2,edm_euler --steps-list 10,20 \
    --num-images 8 --out docs/measurements/sampler_ab_r5.json \
    > logs/sampler_ab_r5.log 2>&1
  python -u scripts/sampler_quality_ab.py \
    --config configs/train_quality_demo.yaml --ckpt "$CKPT" \
    --samplers spaced --steps-list 50 \
    --num-images 8 --out docs/measurements/sampler_ab_r5_s50.json \
    >> logs/sampler_ab_r5.log 2>&1
  python scripts/render_quality_docs.py
  commit "Sampler family/step-count quality ladder on the trained checkpoint"

  # 5. batch scaling under the recommended sparse serving config
  : > logs/batch_scaling_rows.jsonl
  for B in 1 2 4; do
    TAIR_BENCH_ENC_TOPK=2048 TAIR_BENCH_SPOTTER_EVERY=2 TAIR_BENCH_BATCH=$B \
      TAIR_BENCH_REPS=3 python -u bench.py 2>>logs/batch_scaling.log \
      | tail -1 >> logs/batch_scaling_rows.jsonl
  done
  commit "Batch scaling b=1,2,4 under the sparse serving config (enc_topk=2048, spotter_every=2)"

  # 6. bench headline (exact) — also leaves the driver's program warm
  python -u bench.py > logs/bench_r5.log 2>&1
  commit "Warm exact-semantics bench ahead of the driver run"
fi

echo "ENDGAME DONE ($TAG)"
