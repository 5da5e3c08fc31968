#!/usr/bin/env bash
# Restore a snapshot made by scripts/snapshot_ckpt.sh into logs/ so that
# supervise.sh / --load_path resume from it on a fresh VM.
#
# Usage: scripts/restore_ckpt.sh artifacts/<run>.ckpt.tar.gz [LOGS_DIR]
set -eu
ARCHIVE="$1"
LOGS_DIR="${2:-logs}"
RUN=$(basename "$ARCHIVE" .ckpt.tar.gz)
DEST="$LOGS_DIR/$RUN"
if [ -d "$DEST/ckpt" ] && [ -n "$(ls -A "$DEST/ckpt" 2>/dev/null)" ]; then
    echo "$DEST/ckpt already has checkpoints; refusing to overwrite" >&2
    exit 1
fi
mkdir -p "$DEST"
tar xzf "$ARCHIVE" -C "$DEST"
echo "restored $RUN -> $DEST (steps: $(ls "$DEST/ckpt"))"
