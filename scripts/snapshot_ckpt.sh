#!/usr/bin/env bash
# Snapshot the latest checkpoint of a run dir into git-tracked artifacts/.
#
# Why: run dirs (logs/) are gitignored and the build VMs are ephemeral — a
# VM reset mid-round destroyed a 93k-step WaveNet campaign.  Snapshotting
# the newest Orbax step + run config into artifacts/<run>.ckpt.tar.gz (one
# stable filename per run, replaced in place) makes training progress
# durable across VM resets; restore with scripts/restore_ckpt.sh.
#
# Usage: scripts/snapshot_ckpt.sh LOG_DIR [ARTIFACTS_DIR]
set -eu
LOG_DIR="${1%/}"
ART_DIR="${2:-artifacts}"
RUN=$(basename "$LOG_DIR")
CKPT_ROOT="$LOG_DIR/ckpt"
[ -d "$CKPT_ROOT" ] || { echo "no ckpt/ under $LOG_DIR" >&2; exit 1; }
# Newest *complete* step dir (orbax writes tmp dirs while saving; those
# contain a marker suffix and are skipped by the numeric-name filter).
STEP=$(ls "$CKPT_ROOT" | grep -E '^[0-9]+$' | sort -n | tail -1)
[ -n "$STEP" ] || { echo "no completed checkpoint step under $CKPT_ROOT" >&2; exit 1; }
mkdir -p "$ART_DIR"
TMP="$ART_DIR/.${RUN}.ckpt.tar.gz.tmp"
# Archive paths relative to the run dir so restore recreates
# <run>/ckpt/<step>/ plus the run config needed for --load_path resume.
EXTRA=()
# metrics.jsonl rides along so the train/eval-loss curve survives VM resets
# (it is the interim convergence evidence between full quality evals).
for f in params.json config.json metrics.jsonl eval.json eval_history.jsonl; do
    [ -f "$LOG_DIR/$f" ] && EXTRA+=("$f")
done
# Best-heldout checkpoint (train_tacotron.py best_eval_batches retention):
# rides along so the quality-argmin snapshot survives VM resets too.
if [ -d "$LOG_DIR/best/ckpt" ]; then
    BEST_STEP=$(ls "$LOG_DIR/best/ckpt" | grep -E '^[0-9]+$' | sort -n | tail -1)
    if [ -n "$BEST_STEP" ]; then
        EXTRA+=("best/ckpt/$BEST_STEP")
        for f in best/params.json best/best.json best/eval.json; do
            [ -f "$LOG_DIR/$f" ] && EXTRA+=("$f")
        done
    fi
fi
tar czf "$TMP" -C "$LOG_DIR" "ckpt/$STEP" "${EXTRA[@]}"
mv "$TMP" "$ART_DIR/$RUN.ckpt.tar.gz"
echo "$STEP" > "$ART_DIR/$RUN.step"
# Eval evidence travels with the checkpoint it measures (quality_eval/
# vocoder_eval write $LOG_DIR/eval.json): committed beside the artifact so
# quality numbers stay reproducible after a VM reset.
if [ -f "$LOG_DIR/eval.json" ]; then
    cp "$LOG_DIR/eval.json" "$ART_DIR/$RUN.eval.json"
    # Staleness guard (VERDICT r3: eval.json lagged the checkpoint by 56k
    # steps): warn loudly when the bundled eval measures a much older step.
    EVAL_STEP=$(python3 -c "import json,sys;print(json.load(open('$LOG_DIR/eval.json')).get('checkpoint_step',0))" 2>/dev/null || echo 0)
    if [ "$((STEP - EVAL_STEP))" -gt 20000 ]; then
        echo "WARNING: $RUN eval.json is stale (eval@$EVAL_STEP vs ckpt@$STEP);" \
             "re-run quality_eval/vocoder_eval before publishing" >&2
    fi
fi
echo "snapshotted $RUN step $STEP -> $ART_DIR/$RUN.ckpt.tar.gz ($(du -h "$ART_DIR/$RUN.ckpt.tar.gz" | cut -f1))"
