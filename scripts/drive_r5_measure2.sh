#!/bin/bash
# Round-5 measurement pass 2: extended tail probe (kNN split + norms +
# two-stage top-k), then the FIXED tail-logits A/B (inner jit cache
# cleared per variant). One TPU process at a time, cooldowns between.
set -u
LOG=/tmp/drive_r5c.log
cd /root/repo/scripts
echo "[seq2] start $(date -u +%FT%TZ)" >> "$LOG"

PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
    python -u probe_tail_phases.py > /tmp/probe_tail2.log 2>&1
echo "[seq2] tail probe rc=$? $(date -u +%FT%TZ)" >> "$LOG"
sleep 180

PYTHONPATH=/root/repo:/root/.axon_site timeout 4800 \
    python -u ab_tail_logits.py 1024 > /tmp/ab_logits2.log 2>&1
echo "[seq2] ab_tail_logits rc=$? $(date -u +%FT%TZ)" >> "$LOG"
echo "[seq2] done" >> "$LOG"
