#!/usr/bin/env bash
# Chain the round-2 training campaigns so the single chip never idles:
# wait for the Tacotron supervisor (pid file) to exit, then launch the
# WaveNet campaign under its own supervisor.  One chip, one process at a
# time (CLAUDE.md); this enforces the handoff instead of a human.
#
# Usage: scripts/chain_campaigns.sh TACO_SUPERVISOR_PIDFILE TACO_SUPERVISE_LOG
set -u
PIDFILE="$1"
TACO_LOG="$2"
PID=$(cat "$PIDFILE" 2>/dev/null || true)
# Fail hard on a missing/empty pidfile or an already-dead PID: an empty
# PID would skip the wait loop and start the second campaign while the
# first still owns the single chip (one process at a time — CLAUDE.md).
if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
    echo "[chain] pidfile '$PIDFILE' missing/empty or pid '$PID' not alive; refusing to chain" >&2
    exit 2
fi
while kill -0 "$PID" 2>/dev/null; do
    sleep 60
done
if grep -q "clean exit" "$TACO_LOG"; then
    echo "[chain] tacotron campaign finished cleanly; starting wavenet"
else
    echo "[chain] tacotron supervisor exited WITHOUT clean exit; trying wavenet anyway"
fi
# Gate wavenet relaunches on a cheap device probe so a backend outage costs
# ~4 min per retry instead of a 20-min hang-watchdog cycle each time.
export SUPERVISE_PROBE=${SUPERVISE_PROBE:-"python -c 'import jax, jax.numpy as jnp; print(float((jnp.ones((8,128))@jnp.ones((128,128))).sum()))'"}
exec scripts/supervise.sh logs/wn_moon python train_vocoder.py \
    --data_dir workdir/moon/data --log_dir logs/wn_moon \
    --num_steps 250000 --batch_size 8 --sample_size 15000
