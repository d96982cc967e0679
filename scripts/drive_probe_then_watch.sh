#!/bin/bash
# Round-5 TPU sequencing: run the decode-breakdown probe until it yields
# stage numbers (box weather permitting), then hand the chip to the
# nominal-bench watcher. One TPU-resident process at a time; ~3 min
# cooldown after every exit (HBM reclamation lag, CLAUDE.md).
set -u
LOG=${LOG:-/tmp/drive_r5.log}
PROBE_LOG=/tmp/probe_dec.log
cd /root/repo/scripts

probe_ok=0
for try in 1 2 3 4; do
    echo "[drive] probe attempt $try $(date -u +%FT%TZ)" >> "$LOG"
    PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
        python -u probe_decode_breakdown.py 1024 > "$PROBE_LOG" 2>&1
    rc=$?
    echo "[drive] probe rc=$rc" >> "$LOG"
    if grep -q "decode_batch=" "$PROBE_LOG"; then
        probe_ok=1
        cp "$PROBE_LOG" /tmp/probe_dec_success.log
        echo "[drive] probe SUCCEEDED on attempt $try" >> "$LOG"
        break
    fi
    sleep 200   # reclamation + let co-tenant spikes pass
done
[ "$probe_ok" = 0 ] && echo "[drive] probe exhausted 4 attempts" >> "$LOG"

sleep 200
echo "[drive] starting nominal watcher $(date -u +%FT%TZ)" >> "$LOG"
exec bash /root/repo/scripts/watch_nominal_bench.sh
