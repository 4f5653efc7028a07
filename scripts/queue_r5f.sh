#!/bin/bash
# Round-5 queue, part F: the serving-chain breakdown probe (needs the chip;
# runs after part E's re-measurements).
set -u
cd /root/repo
while ! grep -q "QUEUE R5E DONE" runs_r5_queue_e.log 2>/dev/null; do sleep 60; done
echo "=== part F $(date) ==="
timeout 30m python scripts/serving_breakdown.py --batch 64 --reps 3 \
  > runs_r5/serving_breakdown.log 2>&1
echo "exit=$? $(date)"
echo "QUEUE R5F DONE $(date)"
