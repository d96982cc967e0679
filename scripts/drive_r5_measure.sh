#!/bin/bash
# Round-5 measurement sequence (one TPU process at a time, reclamation
# cooldowns between): after the in-flight decode-breakdown probe exits,
# run the tail-phases probe, the tail-logits A/B, and the compile sweep,
# then hand the chip to the nominal watcher.
set -u
LOG=/tmp/drive_r5b.log
cd /root/repo/scripts
echo "[seq] start $(date -u +%FT%TZ)" >> "$LOG"

# wait for the running breakdown probe (PID arg 1, optional)
if [ -n "${1:-}" ]; then
    while kill -0 "$1" 2>/dev/null; do sleep 20; done
    echo "[seq] breakdown probe exited $(date -u +%FT%TZ)" >> "$LOG"
    sleep 180
fi

PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
    python -u probe_tail_phases.py > /tmp/probe_tail.log 2>&1
echo "[seq] tail probe rc=$? $(date -u +%FT%TZ)" >> "$LOG"
sleep 180

PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
    python -u ab_tail_logits.py 1024 > /tmp/ab_logits.log 2>&1
echo "[seq] ab_tail_logits rc=$? $(date -u +%FT%TZ)" >> "$LOG"
sleep 180

PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
    python -u compile_sweep.py > /tmp/compile_sweep.log 2>&1
echo "[seq] compile_sweep rc=$? $(date -u +%FT%TZ)" >> "$LOG"
echo "[seq] all probes done; NOT starting the watcher (flip decision" \
     "pending)" >> "$LOG"
