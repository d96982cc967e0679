#!/bin/bash
# Round-5 measurement pass 3: decode breakdown rerun (P3/P4 were lost to
# a compile drop + timeout) and the encode-ceiling probe, then hand the
# chip to the nominal watcher for the rest of the round.
set -u
LOG=/tmp/drive_r5d.log
cd /root/repo/scripts
echo "[seq3] start $(date -u +%FT%TZ)" >> "$LOG"

PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
    python -u probe_decode_breakdown.py 1024 > /tmp/probe_dec3.log 2>&1
echo "[seq3] breakdown rc=$? $(date -u +%FT%TZ)" >> "$LOG"
sleep 180

PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
    python -u probe_encode_ceiling.py > /tmp/probe_enc.log 2>&1
echo "[seq3] encode probe rc=$? $(date -u +%FT%TZ)" >> "$LOG"
sleep 180

echo "[seq3] starting nominal watcher $(date -u +%FT%TZ)" >> "$LOG"
exec bash /root/repo/scripts/watch_nominal_bench.sh
