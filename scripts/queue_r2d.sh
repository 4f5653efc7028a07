#!/bin/bash
# Round-2 queue, part D: after part C, validate bench.py end-to-end on chip.
set -u
cd /root/repo
while ! grep -q "QUEUE C DONE" runs_r2_queue_c.log 2>/dev/null; do sleep 60; done
echo "=== bench validation on chip $(date) ==="
timeout 30m python bench.py > BENCH_mid_r2.json 2> runs_r2/bench_mid.log
echo "bench exit=$? $(date)"; cat BENCH_mid_r2.json
echo "QUEUE D DONE $(date)"
