#!/bin/bash
# Canary-watcher bench (round-3 verdict item 1: measure the nominal
# headline, don't extrapolate it). One warm bench.py process re-measures
# until BOTH canaries sit nominal (encode <= 61 ms loop-timed, dino
# <= 28.5 ms); the shell loop restarts it if the tunnel dies mid-run
# (CLAUDE.md: compile-server drops / outages). Every completed JSON line
# is appended to $OUT with a timestamp; the first load_nominal:true line
# is the round-4 headline.
set -u
OUT=${OUT:-/tmp/bench_watch.jsonl}
LOG=${LOG:-/tmp/bench_watch.log}
PASSES=${BENCH_PASSES:-40}
SLEEP=${BENCH_PASS_SLEEP:-240}
TRIES=${TRIES:-6}

cd /root/repo
for try in $(seq 1 "$TRIES"); do
    echo "[watch] bench run $try/$TRIES $(date -u +%FT%TZ)" >> "$LOG"
    PYTHONPATH=/root/repo:/root/.axon_site BENCH_PASSES="$PASSES" \
        BENCH_PASS_SLEEP="$SLEEP" timeout 21000 python bench.py \
        > /tmp/bench_watch_last.json 2>> "$LOG"
    rc=$?
    if [ -s /tmp/bench_watch_last.json ]; then
        {
            printf '{"ts": "%s", "result": ' "$(date -u +%FT%TZ)"
            cat /tmp/bench_watch_last.json
            printf '}\n'
        } >> "$OUT"
    fi
    echo "[watch] run $try exited rc=$rc" >> "$LOG"
    if [ -s /tmp/bench_watch_last.json ] && \
       grep -q '"load_nominal": true' /tmp/bench_watch_last.json; then
        echo "[watch] NOMINAL captured on run $try" >> "$LOG"
        exit 0
    fi
    sleep 60
done
echo "[watch] exhausted $TRIES runs without a nominal window" >> "$LOG"
exit 1
