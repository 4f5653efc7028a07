#!/bin/bash
# Post-queue probes: wait for the round-3 training queue to drain, then
# measure the remaining serving questions on the freed chip.
set -u
cd /root/repo
while ! grep -q "QUEUE R3 DONE" runs_r3_queue.log 2>/dev/null; do sleep 60; done
echo "=== post-queue probes $(date) ==="
for b in 64 128; do
  echo "=== bench batch $b $(date) ==="
  timeout 15m env BENCH_BATCH=$b python bench.py >> runs_r3/bench_probe.log 2>&1
  echo "exit=$?"
done
echo "POST QUEUE DONE $(date)"
