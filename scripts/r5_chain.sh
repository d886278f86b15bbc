#!/bin/bash
# Round-5 chain: segmented stage-2 spotter-competence training with
# per-segment COMMITTED evidence (VERDICT r4 next-steps #1, #3, #5).
#
# Each segment: train SEG steps on the chip (warm-resume from the newest
# export, monotonic step numbers) -> fp16 export -> score-sweep diagnostic
# on the same chip -> git commit of the diag artifact + training log. A
# mid-round snapshot therefore always contains the newest spotter evidence;
# the endgame is not saved for the final hour.
#
#   TARGET=30000 scripts/r5_chain.sh
cd "$(dirname "$0")/.."
set -x

SEG=${SEG:-3000}
TARGET=${TARGET:-30000}
CFG=configs/train_spotter_demo.yaml
EXP=runs/spotter_demo
mkdir -p "$EXP" docs/measurements logs

LATEST=$(ls "$EXP"/params_step_*.npz 2>/dev/null | tail -1)
[ -n "$LATEST" ] || LATEST=$(ls runs/quality_demo/params_step_*.npz 2>/dev/null | tail -1)
[ -n "$LATEST" ] || { echo "CHAIN ABORT: no starting export" >&2; exit 1; }
STEP=$(basename "$LATEST" | sed 's/params_step_0*\([0-9]*\)\.npz/\1/')

while [ "$STEP" -lt "$TARGET" ]; do
  NEXT=$((STEP + SEG))
  timeout 5400 python -u train.py --config "$CFG" \
    --init-params "$LATEST" --start-step "$STEP" --max-steps "$NEXT" \
    >> logs/train_spotter.log 2>&1
  RC=$?
  NEWEXPORT="$EXP/params_step_$(printf %08d "$NEXT").npz"
  if [ ! -f "$NEWEXPORT" ]; then
    echo "CHAIN ABORT: train segment rc=$RC, no $NEWEXPORT" >&2
    exit 1
  fi
  LATEST="$NEWEXPORT"; STEP=$NEXT

  # per-export evidence: held-out score sweep on the chip
  timeout 2400 python -u scripts/spotter_diag.py --config "$CFG" \
    --ckpt "$LATEST" --num-images 8 \
    --out "docs/measurements/spotter_diag_step${STEP}.json" \
    > "logs/spotter_diag_step${STEP}.log" 2>&1

  git add "docs/measurements/spotter_diag_step${STEP}.json" \
          "logs/spotter_diag_step${STEP}.log" logs/train_spotter.log
  git commit -m "spotter stage-2 step ${STEP}: per-segment evidence (score sweep + train log)" \
    || echo "commit at step ${STEP} made no changes" >&2
done
echo "CHAIN DONE at step ${STEP}"
