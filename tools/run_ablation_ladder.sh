#!/bin/bash
# LSFA module-ablation ladder on the hardened synthetic VID benchmark
# (VERDICT r3 item 1): each rung trains the REAL recipe on the TPU via
# tools/train_synth_full.py and evaluates held-out mAP through the
# production eval driver. Rungs share one cached dataset (--data).
#
# TWO-STAGE, mirroring the reference recipe (pretrained ResNet +
# combine_model, dff_rfcn/train_end2end.py:107-115): the single-frame
# rfcn rung trains first and every LSFA rung warm-starts its shared
# detection stack from that checkpoint (--init-from), then trains the
# aggregation modules + fine-tunes end-to-end. The round-4 from-scratch
# ladder (reports *_scratch.json) is the recorded negative result: joint
# from-scratch training never converges its RPN regression on hard data
# (rpn_bbox median ~1.0 at 4.5k steps vs 0.045 for rfcn).
#
#   rfcn    -> single-frame R-FCN stage-A pretrain (full backbone/frame)
#   mv_only -> pure DFF-style MV warping (no R-net / small net / Nq)
#   rnet    -> + residual-correction branch
#   small   -> + small-image detail net
#   full    -> + FlowNet/Nq long-term key aggregation (flagship);
#              FLOW_INIT can point at a photometric-pretrained FlowNet
#              checkpoint (tools/pretrain_flow.py) — the in-env stand-in
#              for the reference's FlyingChairs-pretrained FlowNet
#
# Usage: tools/run_ablation_ladder.sh [STEPS] [PROFILE] [OUTROOT]
set -u
set -o pipefail
STEPS=${1:-4500}
PROFILE=${2:-hard}
OUTROOT=${3:-/tmp/lsfa_ablation}
DATA=${DATA:-/tmp/lsfa_synth_data}
FLOW_INIT=${FLOW_INIT:-}
RUNGS=${RUNGS:-"rfcn mv_only rnet small full"}
REPO=$(cd "$(dirname "$0")/.." && pwd)
ART="$REPO/runs/ablation_r04"
mkdir -p "$ART" "$OUTROOT"

# single-instance lock: two concurrent ladders resume each other's
# partial checkpoints and fight over the one TPU (observed r4: the full
# rung trained by two processes at once never converged its RPN)
LOCK=/tmp/lsfa_ablation.lock
exec 9>"$LOCK"
if ! flock -n 9; then
  echo "another ladder instance holds $LOCK — refusing to start" >&2
  exit 1
fi

for RUNG in $RUNGS; do
  OUT="$OUTROOT/$RUNG"
  if [ -f "$ART/report_$RUNG.json" ]; then
    echo "=== rung $RUNG already done, skipping ==="
    continue
  fi
  INIT=""
  if [ "$RUNG" != "rfcn" ]; then
    if [ ! -d "$OUTROOT/rfcn/checkpoints" ]; then
      echo "stage-A rfcn checkpoint missing under $OUTROOT/rfcn — abort" >&2
      exit 1
    fi
    INIT="--init-from $OUTROOT/rfcn/checkpoints"
  fi
  if [ "$RUNG" = "full" ] && [ -n "$FLOW_INIT" ]; then
    INIT="$INIT --init-flow $FLOW_INIT"
  fi
  # crash resume: pick up from the last epoch checkpoint instead of
  # retraining, and keep the longest curves file seen so far (a resumed
  # run that goes straight to eval rewrites curves.jsonl empty)
  RESUME=""
  if [ -d "$OUT/checkpoints" ] && [ -n "$(ls -A "$OUT/checkpoints" 2>/dev/null)" ]; then
    RESUME="--resume"
    echo "(resuming rung $RUNG from $OUT/checkpoints)"
  fi
  if [ -s "$OUT/curves.jsonl" ]; then
    cp "$OUT/curves.jsonl" "$OUT/curves.backup.jsonl"
  fi
  echo "=== rung $RUNG ($STEPS steps, profile=$PROFILE) ==="
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache \
  python "$REPO/tools/train_synth_full.py" \
    --rung "$RUNG" --profile "$PROFILE" --steps "$STEPS" \
    --out "$OUT" --data "$DATA" $INIT $RESUME \
    > "$OUT.log" 2>&1
  rc=$?
  tail -5 "$OUT.log"
  if [ -f "$OUT/curves.backup.jsonl" ] && \
     [ "$(wc -c < "$OUT/curves.backup.jsonl")" -gt "$(wc -c < "$OUT/curves.jsonl" 2>/dev/null || echo 0)" ]; then
    mv "$OUT/curves.backup.jsonl" "$OUT/curves.jsonl"
  fi
  if [ -f "$OUT/report.json" ]; then
    cp "$OUT/report.json" "$ART/report_$RUNG.json"
    cp "$OUT/curves.jsonl" "$ART/curves_$RUNG.jsonl" 2>/dev/null
  else
    echo "rung $RUNG FAILED (rc=$rc)"
  fi
done
echo "=== ladder complete ==="
ls -la "$ART"
