#!/usr/bin/env bash
# Round-5 post-training chip queue (RUN12K.md).  Waits for the spemb
# trainer to release the chip (DONE marker from launch_spemb.sh), then
# runs the remaining on-chip work in headline-priority order:
#   1. final conditioned-checkpoint MCD sweep  -> sweep_spemb_*.json
#   2. real-speech edit round-trip (stages 2-3) -> docs/REAL_SPEECH_DEMO.json
#   3. conv-BN + dropout-PRNG step-bench rows   -> docs/STEP_BENCH rows
#   4. assemble MCD_r05.json at the repo root
# Each stage is bounded and logged; a wipe can re-run this script.
#
#   bash recipes/soak/post_train.sh <workdir> [real_workdir]
set -u
W=${1:?workdir}
RW=${2:-/root/repo/.workdirs/real}
REPO=$(cd "$(dirname "$0")/../.." && pwd)
cd "$REPO"

while [ ! -e "$W/exp_spemb/DONE" ]; do sleep 30; done
echo "[post] trainer released the chip"

SNAP="$W/curve_ckpts_exp_spemb/checkpoints"

# --- 1. final sweep: ave_* + best curve epoch +-8 (on the real chip) ---
best=$(python - "$W" <<'EOF'
import json, os, sys
w = sys.argv[1]
pts = []
for f in os.listdir(w):
    if f.startswith("exp_spemb_curve_e") and f.endswith(".json"):
        r = json.load(open(os.path.join(w, f)))
        if "seen" in r:
            e = int(f[len("exp_spemb_curve_e"):-5])
            pts.append((r["seen"]["mean_mcd"] + r["unseen"]["mean_mcd"], e))
print(min(pts)[1] if pts else 0)
EOF
)
echo "[post] best curve epoch: $best"
CK="$W/exp_spemb/checkpoints"
AVE=$(ls -d "$CK"/ave_* 2>/dev/null | sort | tail -1)
if [ -n "${AVE:-}" ]; then
  tag=$(basename "$AVE")
  [ -e "$W/sweep_spemb_$tag.json" ] || timeout 3600 \
    python recipes/soak/curve_eval.py --workdir "$W" \
      --exp-name exp_spemb --epoch "-1" --device "" \
      --vocoder artifacts/vocoder --eval-utts 8 \
      --ckpt-name "$tag" --out "$W/sweep_spemb_$tag.json" \
      > "$W/sweep_$tag.log" 2>&1 && echo "[post] sweep $tag done"
fi
for e in $((best-8)) $best $((best+8)); do
  [ "$e" -gt 0 ] || continue
  d="$SNAP/epoch_$e"; [ -d "$d" ] || d="$CK/epoch_$e"; [ -d "$d" ] || continue
  out="$W/sweep_spemb_e$e.json"
  [ -e "$out" ] && continue
  timeout 3600 python recipes/soak/curve_eval.py --workdir "$W" \
    --exp-name exp_spemb --epoch "$e" --device "" \
    --vocoder artifacts/vocoder --eval-utts 8 --out "$out" \
    > "$W/sweep_e$e.log" 2>&1 && echo "[post] sweep e$e done"
done

# --- 2. real-speech fine-tune + edit round-trip ---
if [ ! -e "docs/REAL_SPEECH_DEMO.json" ]; then
  timeout 5400 python recipes/real_speech/run.py --workdir "$RW" \
    --stage 2 --stop-stage 3 --init-params artifacts/soak12k_params \
    >> "$RW/run23.log" 2>&1 && echo "[post] real-speech done"
fi

# --- 3. step-bench rows: conv-BN dtype + dropout PRNG impl ---
timeout 5400 python bench_step.py --variants prod bn_bf16 threefry_dropout \
  > "$W/bench_bn.log" 2>&1 && echo "[post] bench rows done"

# --- 4. assemble the round-5 quality record ---
python recipes/soak/assemble_mcd_r05.py --workdir "$W" --out MCD_r05.json \
  > "$W/assemble.log" 2>&1 && echo "[post] MCD_r05.json assembled"
echo "[post] queue complete"
