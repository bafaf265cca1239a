#!/usr/bin/env bash
# Snapshot + off-chip-eval watcher for a live spemb training run.
#
# The trainer prunes epoch checkpoints to keep_nbest, so curve points must
# be snapshotted out of the live exp dir promptly.  This loop (a) copies
# every --every-th epoch into the curve snapshot dir as soon as it
# finalizes, and (b) sequentially evaluates any snapshot that has no curve
# json yet, on the CPU backend so the single-client TPU tunnel stays
# dedicated to the trainer (round-4/5 protocol, RUN12K.md).
#
#   bash recipes/soak/spemb_watch.sh <workdir> [exp_name] [every] [vocoder]
#
# Exits when <workdir>/<exp_name>/DONE appears (touched by the launcher
# after the trainer exits) and all queued evals have run.
set -u
W=${1:?workdir}
EXP=${2:-exp_spemb}
EVERY=${3:-8}
REPO=$(cd "$(dirname "$0")/../.." && pwd)
VOC=${4:-$REPO/artifacts/vocoder}
SNAP="$W/curve_ckpts_$EXP"
mkdir -p "$SNAP/checkpoints"

snapshot() {
  for d in "$W/$EXP"/checkpoints/epoch_*; do
    [ -d "$d" ] || continue
    n=$(basename "$d"); n=${n#epoch_}
    # the glob also matches in-flight epoch_N.orbax-checkpoint-tmp dirs;
    # a non-numeric n would be a fatal arithmetic error in non-interactive bash
    case $n in (*[!0-9]*|'') continue;; esac
    [ $((n % EVERY)) -eq 0 ] || continue
    dst="$SNAP/checkpoints/epoch_$n"
    [ -d "$dst" ] && continue
    # only copy finalized checkpoints (orbax writes the marker last)
    [ -e "$d/_CHECKPOINT_METADATA" ] || [ -e "$d/_METADATA" ] || continue
    cp -r "$d" "$dst.tmp" && mv "$dst.tmp" "$dst"
    echo "[watch] snapshotted epoch_$n"
  done
  cp -f "$W/$EXP/config.yaml" "$W/$EXP/tokens.txt" "$SNAP/" 2>/dev/null
}

eval_one() {
  for d in "$SNAP"/checkpoints/epoch_*; do
    [ -d "$d" ] || continue
    n=$(basename "$d"); n=${n#epoch_}
    out="$W/${EXP}_curve_e$n.json"
    [ -e "$out" ] && continue
    echo "[watch] evaluating epoch_$n (cpu)"
    JAX_PLATFORMS=cpu python "$REPO/recipes/soak/curve_eval.py" \
      --workdir "$W" --exp-name "$EXP" --epoch "$n" \
      --vocoder "$VOC" --eval-utts 8 \
      > "$W/curve_${EXP}_e$n.log" 2>&1
    return 0   # one eval per outer loop so snapshots stay fresh
  done
  return 1
}

while true; do
  snapshot
  eval_one || {
    if [ -e "$W/$EXP/DONE" ]; then echo "[watch] done"; exit 0; fi
    sleep 20
  }
done
