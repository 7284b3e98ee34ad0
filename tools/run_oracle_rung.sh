#!/bin/bash
# Oracle-warp rung (VERDICT r4 item 1b), run AFTER tools/run_ablation_r05.sh
# (same flock — refuses to overlap the ladder): trains the mv_only graph
# with the generator's analytic GT flow substituted for decoded MVs
# (data/oracle_flow.py) and re-scores it on the extended val set. The
# result upper-bounds what ANY motion-vector estimate can achieve on this
# benchmark: oracle >> mv_only means the codec's blocky 16x16 MV field is
# the accuracy ceiling; oracle ~= mv_only means warped-feature detection
# itself (training/propagation) is the bound.
set -u
set -o pipefail
export PYTHONUNBUFFERED=1
STEPS=${1:-4500}
PROFILE=${2:-hard}
REPO=$(cd "$(dirname "$0")/.." && pwd)
ART="$REPO/runs/ablation_r05"
DATA="$ART/data"
OUTROOT="$ART/ckpts"
BATCH="C-$(date +%Y%m%d)"

LOCK=/tmp/lsfa_ablation.lock
exec 9>"$LOCK"
if ! flock -n 9; then
  echo "ladder instance holds $LOCK — run after it finishes" >&2
  exit 1
fi

if [ ! -d "$OUTROOT/rfcn/checkpoints" ]; then
  echo "stage-A rfcn checkpoint missing — run run_ablation_r05.sh first" >&2
  exit 1
fi

if [ ! -f "$ART/report_oracle.json" ]; then
  echo "=== rung oracle ($STEPS steps, profile=$PROFILE) ==="
  python "$REPO/tools/train_synth_full.py" \
    --rung oracle --profile "$PROFILE" --steps "$STEPS" \
    --out "$OUTROOT/oracle" --data "$DATA" --batch-tag "$BATCH" \
    --init-from "$OUTROOT/rfcn/checkpoints" \
    > "$OUTROOT/oracle.log" 2>&1
  tail -3 "$OUTROOT/oracle.log"
  cp "$OUTROOT/oracle/report.json" "$ART/report_oracle.json" || exit 1
  cp "$OUTROOT/oracle/curves.jsonl" "$ART/curves_oracle.jsonl" 2>/dev/null
fi
[ -f "$ART/report_oracle_xval.json" ] || \
  python "$REPO/tools/eval_rung.py" --rung oracle \
    --ckpt "$OUTROOT/oracle/checkpoints" --data "$DATA" \
    --profile "$PROFILE" --out "$ART" \
    >> "$OUTROOT/oracle.xval.log" 2>&1

python "$REPO/tools/render_ablation.py" --dir "$ART"
echo "=== oracle rung complete ==="
