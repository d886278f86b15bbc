#!/bin/bash
# Round-4 artifact supply chain (runs/ was wiped between rounds; .gitignore
# excludes runs/, results/, *.npz). Sequences the chip jobs so the device
# never idles: pretrain-vae -> warm-start -> stage-3 quality-demo training.
# The swinir pretrain phase is launched separately first (/tmp/pretrain.pid).
set -e
cd "$(dirname "$0")/.."

# wait for the swinir phase to finish, then verify it saved
while kill -0 "$(cat /tmp/pretrain.pid 2>/dev/null)" 2>/dev/null; do sleep 10; done
grep -q "saved pretrained modules" logs/pretrain_swinir.log || {
  echo "CHAIN ABORT: swinir pretrain did not save" >&2; exit 1; }

python scripts/pretrain_demo.py --out runs/pretrain/frozen.npz \
  --phase vae --vae-steps 3000 --batch 2 > logs/pretrain_vae.log 2>&1
grep -q "saved pretrained modules" logs/pretrain_vae.log || {
  echo "CHAIN ABORT: vae pretrain did not save" >&2; exit 1; }

# pure weight surgery — run on the host CPU backend, not through the relay
scripts/cpu_run.sh python scripts/make_warmstart.py \
  --config configs/train_quality_demo.yaml \
  --pretrain runs/pretrain/frozen.npz \
  --out runs/pretrain/warmstart.npz > logs/warmstart.log 2>&1

python train.py --config configs/train_quality_demo.yaml \
  > logs/train_quality.log 2>&1
echo "CHAIN DONE"
