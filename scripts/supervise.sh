#!/usr/bin/env bash
# Campaign supervisor: keep a train driver running until it finishes cleanly.
#
# The train drivers hard-exit with code 42 when their HangWatchdog detects a
# wedged device RPC (see train/watchdog.py) and exec-restart themselves on
# host-RSS pressure; anything else nonzero is a real crash, retried a few
# times in case the chip lease was mid-recovery.  Resumes pass --load_path
# only once a checkpoint exists so a fresh run initializes normally.
#
# Usage:
#   scripts/supervise.sh LOG_DIR python train_vocoder.py --data_dir D \
#       --log_dir LOG_DIR --num_steps 250000 ...
# When SUPERVISE_PROBE is set (a shell command, e.g. a tiny on-device
# matmul), a failed run is followed by a cheap probe loop instead of
# immediately relaunching the heavy trainer: each retry then costs
# ~PROBE_TIMEOUT_S instead of a full 20-min hang-watchdog cycle, and probe
# failures do NOT consume MAX_RETRIES — so a multi-hour backend outage
# doesn't exhaust the real-crash budget.
set -u
LOG_DIR="$1"; shift
MAX_RETRIES=${MAX_RETRIES:-30}
tries=0

# Single-supervisor guard: two chains driving one log_dir interleave
# training steps and race Orbax checkpoint retention (observed round 4:
# steps 225.9k/226.4k trained concurrently and one trainer deleted a step
# the other tracked).  flock on a per-log_dir lockfile, held for the whole
# supervision, makes the second launch fail fast instead.
exec 9>"$LOG_DIR/.supervise.lock"
if ! flock -n 9; then
    echo "[supervise] REFUSING to start: another supervisor already drives" \
         "$LOG_DIR (lock $LOG_DIR/.supervise.lock is held)" >&2
    exit 43
fi

# Durability guard: refuse to drive a campaign whose log_dir has no live
# autosnapshot (scripts/autosnapshot.sh writes $LOG_DIR/.autosnapshot.pid).
# Two VM resets destroyed unprotected checkpoints; snapshotting every
# flagship run is policy.  Override for throwaway runs with
# SUPERVISE_NO_SNAPSHOT=1.
if [ -z "${SUPERVISE_NO_SNAPSHOT:-}" ]; then
    PIDFILE="$LOG_DIR/.autosnapshot.pid"
    if ! { [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; }
    then
        echo "[supervise] REFUSING to start: no live autosnapshot for" \
             "$LOG_DIR (start scripts/autosnapshot.sh $LOG_DIR 600 first," \
             "or set SUPERVISE_NO_SNAPSHOT=1 for a throwaway run)" >&2
        exit 40
    fi
fi

wait_for_device() {
    [ -n "${SUPERVISE_PROBE:-}" ] || return 0
    local pt=0
    until timeout "${PROBE_TIMEOUT_S:-240}" bash -c "$SUPERVISE_PROBE" \
            >/dev/null 2>&1; do
        pt=$((pt + 1))
        if [ "$pt" -ge "${PROBE_MAX_TRIES:-200}" ]; then
            echo "[supervise] device probe still failing after $pt tries; giving up"
            exit 41
        fi
        echo "[supervise] device probe failed ($pt/${PROBE_MAX_TRIES:-200}); waiting ${RETRY_SLEEP_S:-120}s"
        sleep "${RETRY_SLEEP_S:-120}"
    done
    echo "[supervise] device probe ok"
}
while :; do
    extra=()
    if [ -d "$LOG_DIR/ckpt" ] && [ -n "$(ls -A "$LOG_DIR/ckpt" 2>/dev/null)" ]
    then
        extra=(--load_path "$LOG_DIR")
    fi
    "$@" "${extra[@]}"
    rc=$?
    if [ "$rc" -eq 0 ]; then
        echo "[supervise] clean exit"; exit 0
    fi
    tries=$((tries + 1))
    if [ "$tries" -ge "$MAX_RETRIES" ]; then
        echo "[supervise] giving up after $tries failures (last rc=$rc)"
        exit "$rc"
    fi
    # rc=42: hang watchdog fired; the chip recovers when the dead client's
    # lease expires (~10-20 min) — restart immediately and let the fresh
    # client block until then (its own watchdog re-fires if still wedged).
    echo "[supervise] rc=$rc (attempt $tries/$MAX_RETRIES); retrying in ${RETRY_SLEEP_S:-120}s"
    sleep "${RETRY_SLEEP_S:-120}"
    wait_for_device
done
