#!/bin/bash
# Round-2 queue, part E: after part D, probe bench batch sizes on chip.
set -u
cd /root/repo
while ! grep -q "QUEUE D DONE" runs_r2_queue_d.log 2>/dev/null; do sleep 60; done
for b in 16 32; do
  echo "=== bench batch $b $(date) ==="
  timeout 30m env BENCH_BATCH=$b python bench.py 2>> runs_r2/bench_mid.log
  echo "exit=$?"
done
echo "QUEUE E DONE $(date)"
