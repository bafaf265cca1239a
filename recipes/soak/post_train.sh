#!/usr/bin/env bash
# Round-5 post-training queue (RUN12K.md).  Waits for the spemb trainer
# to release the chip (DONE marker from launch_spemb.sh), then runs the
# remaining round-5 work:
#   A. (CPU, overlapped with B) final eval battery on the best
#      conditioned checkpoint: +-8 sweep, speaker-average source,
#      short/long length controls, uncond short control
#   B. (chip) real-speech fine-tune + edit round-trip (stages 2-3)
#   C. (idle host + chip) conv-BN + dropout-PRNG step-bench rows
#   D. assemble MCD_r05.json at the repo root
# Each stage is bounded and logged; a wipe can re-run this script.
#
#   bash recipes/soak/post_train.sh <workdir> [real_workdir]
set -u
W=${1:?workdir}
RW=${2:-/root/repo/.workdirs/real}
REPO=$(cd "$(dirname "$0")/../.." && pwd)
cd "$REPO"
log() { echo "[post $(date +%H:%M:%S)] $*"; }

while [ ! -e "$W/exp_spemb/DONE" ]; do sleep 30; done
log "trainer released the chip"

SNAP="$W/curve_ckpts_exp_spemb/checkpoints"
CK="$W/exp_spemb/checkpoints"

# --- wait (bounded 20 min) for the curve watcher to drain its queue ---
pending() {
  for d in "$SNAP"/epoch_*; do
    [ -d "$d" ] || continue
    n=$(basename "$d"); n=${n#epoch_}
    case $n in (*[!0-9]*|'') continue;; esac
    [ -e "$W/exp_spemb_curve_e$n.json" ] || return 0
  done
  return 1
}
i=0
while pending && [ $i -lt 60 ]; do sleep 20; i=$((i + 1)); done
log "watcher queue drained"

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
log "best curve epoch: $best"

ev() {  # ev <epoch|ckpt-args...> <out> <extra args...>
  local out=$1; shift
  [ -e "$out" ] && return 0
  timeout 2400 python recipes/soak/curve_eval.py --workdir "$W" \
    --device cpu --vocoder artifacts/vocoder "$@" --out "$out" \
    > "${out%.json}.log" 2>&1 && log "$(basename "$out") done"
}

# --- A. CPU eval battery (background, overlaps the chip work) ---------
(
  # the on-disk trainer checkpoints (10, 11) bracket the left edge of
  # the snapshot grid in case the curve minimum sits before epoch 16
  for e in $((best - 8)) 10 11 $best $((best + 8)); do
    [ "$e" -gt 0 ] || continue
    [ -d "$SNAP/epoch_$e" ] || [ -d "$CK/epoch_$e" ] || continue
    ev "$W/sweep_spemb_e$e.json" \
      --exp-name exp_spemb --epoch "$e" --eval-utts 8
  done
  ev "$W/sweep_spemb_e${best}_spkavg.json" \
    --exp-name exp_spemb --epoch "$best" --eval-utts 8 \
    --spemb-source speaker
  # short-utterance controls: the regime the round-5 conditioning targets
  ev "$W/ctrl_short_spemb_spk.json" \
    --exp-name exp_spemb --epoch "$best" --eval-utts 24 \
    --max-phones 12 --spemb-source speaker
  ev "$W/ctrl_short_spemb_ctx.json" \
    --exp-name exp_spemb --epoch "$best" --eval-utts 24 \
    --max-phones 12 --spemb-source context
  ev "$W/ctrl_short_uncond.json" \
    --exp-name exp_uncond_cal --epoch 1 --eval-utts 24 --max-phones 12
  # long control: no regression at reference-protocol lengths
  ev "$W/ctrl_long_spemb.json" \
    --exp-name exp_spemb --epoch "$best" --eval-utts 24 \
    --min-phones 18 --max-phones 23 --spemb-source speaker
  log "CPU eval battery complete"
) > "$W/evals.log" 2>&1 &
EVPID=$!

# --- B. real-speech fine-tune + edit round-trip (chip) ----------------
if [ ! -e "docs/REAL_SPEECH_DEMO.json" ]; then
  timeout 5400 python recipes/real_speech/run.py --workdir "$RW" \
    --stage 2 --stop-stage 3 --init-params artifacts/soak12k_params \
    >> "$RW/run23.log" 2>&1 && log "real-speech done"
fi

wait "$EVPID"

# --- C. step-bench rows: conv-BN dtype + dropout PRNG impl ------------
timeout 5400 python bench_step.py --variants prod bn_bf16 threefry_dropout \
  > "$W/bench_bn.log" 2>&1 && log "bench rows done"

# --- D. assemble the round-5 quality record ---------------------------
python recipes/soak/assemble_mcd_r05.py --workdir "$W" --out MCD_r05.json \
  > "$W/assemble.log" 2>&1 && log "MCD_r05.json assembled"
log "queue complete"
