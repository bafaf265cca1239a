#!/usr/bin/env bash
# Round-5 speaker-conditioned training launcher (RUN12K.md round-5 sequence).
# Runs stage 4 (--spemb) bounded by a wall-clock timeout, then marks DONE
# for the curve watcher and refreshes the committed bf16 stash so a session
# wipe cannot strand the run (learned in rounds 3+4).
#
#   bash recipes/soak/launch_spemb.sh <workdir> [epochs] [timeout_s]
set -u
W=${1:?workdir}
EPOCHS=${2:-80}
LIMIT=${3:-11000}
REPO=$(cd "$(dirname "$0")/../.." && pwd)
cd "$REPO"

timeout "$LIMIT" python recipes/soak/run.py --workdir "$W" \
  --stage 4 --stop-stage 4 --exp-name exp_spemb --spemb \
  --n-utts 12000 --n-speakers 16 \
  --epochs "$EPOCHS" --iters-per-epoch 400 --warmup-steps 1000 \
  --steps-per-dispatch 8 --mlm-prob-factor 1.0 \
  --init-params artifacts/soak12k_params \
  2>&1 | tee -a "$W/train_spemb.log"
rc=$?
touch "$W/exp_spemb/DONE"
echo "[launch] trainer exited rc=$rc; exporting stash"
CK="$W/exp_spemb/checkpoints"
AVE=$(ls -d "$CK"/ave_* 2>/dev/null | sort | tail -1)
if [ -n "$AVE" ]; then EPOCH=$(basename "$AVE"); else EPOCH=latest; fi
python -m a3t_tpu.bin.export_params --exp "$CK" --epoch "$EPOCH" \
  --out artifacts/spemb_params 2>&1 | tail -2 || true
cp -f "$W/exp_spemb/tokens.txt" artifacts/spemb_params/ 2>/dev/null || true
echo "[launch] done"
