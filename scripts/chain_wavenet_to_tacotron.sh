#!/usr/bin/env bash
# Reverse handoff of chain_campaigns.sh: wait for the WaveNet supervisor to
# exit, then run the Tacotron multi-speaker campaign (VERDICT #4) on the
# freed chip.  One chip, one process at a time (CLAUDE.md).
#
# Usage: scripts/chain_wavenet_to_tacotron.sh WN_SUPERVISOR_PIDFILE WN_SUPERVISE_LOG
set -u
REPO="${REPO:-/root/repo}"
cd "$REPO"
PIDFILE="$1"
WN_LOG="$2"
PID=$(cat "$PIDFILE" 2>/dev/null || true)
if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
    echo "[chain] pidfile '$PIDFILE' missing/empty or pid '$PID' not alive; refusing to chain" >&2
    exit 2
fi
while kill -0 "$PID" 2>/dev/null; do
    sleep 60
done
if grep -q "clean exit" "$WN_LOG"; then
    echo "[chain] wavenet campaign finished cleanly; starting tacotron"
else
    echo "[chain] wavenet supervisor exited WITHOUT clean exit; trying tacotron anyway"
fi
# Final durable snapshot of the finished WaveNet run before the chip moves on.
scripts/snapshot_ckpt.sh logs/wn_moon || true
git add artifacts/wn_moon.ckpt.tar.gz artifacts/wn_moon.step 2>/dev/null \
    && git commit -q -m "Snapshot wn_moon checkpoint at campaign handoff" \
         -- artifacts/wn_moon.ckpt.tar.gz artifacts/wn_moon.step || true
export SUPERVISE_PROBE=${SUPERVISE_PROBE:-"python -c 'import jax, jax.numpy as jnp; print(float((jnp.ones((8,128))@jnp.ones((128,128))).sum()))'"}
nohup /tmp/runscripts/autosnapshot.sh logs/both_r2 300 \
    > /tmp/autosnapshot_both_r2.log 2>&1 &
# Bare --skip_path_filter is REQUIRED (CLAUDE.md campaign gotcha): without
# it the reference length filter + 20-per-speaker holdout leaves only
# 14+15 train clips.
exec scripts/supervise.sh logs/both_r2 python train_tacotron.py \
    --data_paths workdir/moon/data,workdir/son/data \
    --log_dir logs/both_r2 --num_steps 100000 --model_type deepvoice \
    --skip_path_filter \
    --hparams "tacotron.compute_dtype=bfloat16,tacotron.fused_rnn=True,tacotron.scan_unroll=8,train.num_test_per_speaker=20,train.test_interval=2500"
