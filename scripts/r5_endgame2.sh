#!/bin/bash
# Round-5 session-2 endgame: the remaining VERDICT-r4 evidence, ordered by
# value-per-minute, each stage committing immediately. Sized for the tail
# of a session (the full r5_endgame.sh presets assume more wall-clock).
#
#   CKPT=runs/spotter_demo/params_step_00005000.npz scripts/r5_endgame2.sh
cd "$(dirname "$0")/.."
set -x

CKPT=${CKPT:-$(ls runs/spotter_demo/params_step_*.npz 2>/dev/null | tail -1)}
[ -n "$CKPT" ] || CKPT=$(ls runs/quality_demo/params_step_*.npz 2>/dev/null | tail -1)
[ -n "$CKPT" ] || { echo "ENDGAME2 ABORT: no params export" >&2; exit 1; }
THRESH=${THRESH:-0.2}
echo "using checkpoint $CKPT threshold $THRESH"

commit() {
  git add -A docs/measurements docs logs results 2>/dev/null
  git commit -q -m "$1" || echo "commit made no changes: $1" >&2
}

# 1. held-out spotter competence: det/E2E F + RRC/COCO submission dump
timeout 1800 python -u spotter_eval.py --config configs/train_quality_demo.yaml \
  --ckpt "$CKPT" --num-images 16 --score-threshold "$THRESH" \
  --lexicon-from-gt --dump-dir results/spotter_submission \
  > logs/spotter_eval_r5.log 2>&1
tail -1 logs/spotter_eval_r5.log > docs/measurements/spotter_eval_r5.json || true
commit "Held-out spotter eval (r5 rebuild): det/E2E F at threshold ${THRESH} + submission dump"

# 2. trained-model demo: whole-image val on the held-out pairs
timeout 1800 python -u val.py --config configs/val_trained_demo.yaml \
  --ckpt "$CKPT" --image-size 256 > logs/demo_val.log 2>&1
commit "Trained-model demo: val.py restorations + pred-text panels on held-out pairs"

# 3. sampler family/step-count ladder (compressed: 4 images)
timeout 2400 python -u scripts/sampler_quality_ab.py \
  --config configs/train_quality_demo.yaml --ckpt "$CKPT" \
  --samplers spaced,dpm_solver_2,edm_euler --steps-list 10,20 \
  --num-images 4 --out docs/measurements/sampler_ab_r5.json \
  > logs/sampler_ab_r5.log 2>&1
timeout 1200 python -u scripts/sampler_quality_ab.py \
  --config configs/train_quality_demo.yaml --ckpt "$CKPT" \
  --samplers spaced --steps-list 50 \
  --num-images 4 --out docs/measurements/sampler_ab_r5_s50.json \
  >> logs/sampler_ab_r5.log 2>&1
python scripts/render_quality_docs.py
commit "Sampler family/step-count quality ladder on the rebuilt checkpoint"

# 4. batch scaling under the revised recommended serving config (se2-only,
#    SERVING.md) + the r4-era sparse combo for the standing perf question
: > logs/batch_scaling_rows.jsonl
for B in 1 2 4; do
  TAIR_BENCH_SPOTTER_EVERY=2 TAIR_BENCH_BATCH=$B TAIR_BENCH_REPS=2 \
    timeout 1200 python -u bench.py 2>>logs/batch_scaling.log \
    | tail -1 >> logs/batch_scaling_rows.jsonl
done
for B in 2 4; do
  TAIR_BENCH_ENC_TOPK=2048 TAIR_BENCH_SPOTTER_EVERY=2 TAIR_BENCH_BATCH=$B \
    TAIR_BENCH_REPS=2 timeout 1200 python -u bench.py 2>>logs/batch_scaling.log \
    | tail -1 >> logs/batch_scaling_rows.jsonl
done
commit "Batch scaling b=1,2,4 under se2 and sparse+se2 serving configs"

# 5. warm exact-semantics bench for the driver
timeout 1200 python -u bench.py > logs/bench_r5.log 2>&1
commit "Warm exact-semantics bench ahead of the driver run"

echo "ENDGAME2 DONE"
