#!/bin/bash
# Round-4 chain, session-restart variant (swinir phase already running under
# /tmp/pretrain.pid): vae pretrain -> warm-start surgery -> stage-3 training
# in the background with its pid in /tmp/train.pid so scripts/r4_endgame.sh
# (and an adaptive early cut) can track it.
set -e
cd "$(dirname "$0")/.."

while kill -0 "$(cat /tmp/pretrain.pid 2>/dev/null)" 2>/dev/null; do sleep 10; done
grep -q "saved pretrained modules" logs/pretrain_swinir.log || {
  echo "CHAIN ABORT: swinir pretrain did not save" >&2; exit 1; }

python -u scripts/pretrain_demo.py --out runs/pretrain/frozen.npz \
  --phase vae --vae-steps 3000 --batch 2 > logs/pretrain_vae.log 2>&1
grep -q "saved pretrained modules" logs/pretrain_vae.log || {
  echo "CHAIN ABORT: vae pretrain did not save" >&2; exit 1; }

# pure weight surgery — host CPU backend, off the relay
scripts/cpu_run.sh python scripts/make_warmstart.py \
  --config configs/train_quality_demo.yaml \
  --pretrain runs/pretrain/frozen.npz \
  --out runs/pretrain/warmstart.npz > logs/warmstart.log 2>&1
grep -q "re-randomized" logs/warmstart.log || {
  echo "CHAIN ABORT: warmstart surgery failed" >&2; exit 1; }

nohup python -u train.py --config configs/train_quality_demo.yaml \
  > logs/train_quality.log 2>&1 &
echo $! > /tmp/train.pid
echo "CHAIN DONE: training started pid $(cat /tmp/train.pid)"
