#!/usr/bin/env bash
# Periodically snapshot a campaign's latest checkpoint into git so training
# progress survives an ephemeral-VM reset (which destroys gitignored logs/).
#
# Runs alongside a campaign: every INTERVAL_S it tars the newest Orbax step
# via snapshot_ckpt.sh and commits artifacts/<run>.ckpt.tar.gz when the step
# advanced.  git's own index lock serializes against interactive commits; a
# lost race is retried on the next cycle.
#
# Usage: scripts/autosnapshot.sh LOG_DIR [INTERVAL_S]
set -u
LOG_DIR="${1%/}"
INTERVAL_S="${2:-600}"
RUN=$(basename "$LOG_DIR")
# Run with cwd at the repo root (campaign copies live in /tmp/runscripts,
# so $0-relative paths would escape the repo — CLAUDE.md gotcha).
REPO="${REPO:-/root/repo}"
cd "$REPO"
# Liveness marker: supervise.sh refuses to start a campaign whose log_dir
# has no live autosnapshot (VM resets destroyed unprotected checkpoints
# twice; durability is policy now, not discipline).
mkdir -p "$LOG_DIR"
echo $$ > "$LOG_DIR/.autosnapshot.pid"
# Remove the marker on any exit so supervise.sh's kill -0 check can't pass
# via PID reuse after a crash/reboot (the guard would silently not guard).
trap 'rm -f "$LOG_DIR/.autosnapshot.pid"' EXIT
while :; do
    sleep "$INTERVAL_S"
    scripts/snapshot_ckpt.sh "$LOG_DIR" >/dev/null 2>&1 || continue
    STEP=$(cat "artifacts/$RUN.step" 2>/dev/null || echo "?")
    if ! git diff --quiet -- "artifacts/$RUN.step" 2>/dev/null \
            || ! git ls-files --error-unmatch "artifacts/$RUN.step" \
                 >/dev/null 2>&1; then
        EVAL=()
        [ -f "artifacts/$RUN.eval.json" ] && EVAL=("artifacts/$RUN.eval.json")
        git add "artifacts/$RUN.ckpt.tar.gz" "artifacts/$RUN.step" "${EVAL[@]}" \
            && git commit -q -m "Snapshot $RUN checkpoint at step $STEP" \
                 -- "artifacts/$RUN.ckpt.tar.gz" "artifacts/$RUN.step" \
                    "${EVAL[@]}" \
            && echo "[autosnapshot] committed $RUN step $STEP"
    fi
done
