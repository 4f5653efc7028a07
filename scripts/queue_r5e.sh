#!/bin/bash
# Round-5 queue, part E: re-measure serving with the final code (part C ran
# mid-optimization: before device-side mu/idx + on-chip word compaction),
# fixed hbm_table A/B, and cross-platform checks against checkpoints that
# actually exist this round (r4's were wiped at round transition — only
# runs_r3/* checkpoints are tracked in git; r5's are on disk).
set -u
cd /root/repo

while ! grep -q "QUEUE R5D DONE" runs_r5_queue_d.log 2>/dev/null; do sleep 60; done
echo "=== part E measurements start $(date) ==="

step() {
  name=$1; shift
  echo "=== $name $(date) ==="
  timeout 30m "$@" > "runs_r5/$name.log" 2>&1
  echo "exit=$? $(date)"
}

step hbm_table_v2 python benchmarks/hbm_table.py --batch 128
step serving_batch_v2 python benchmarks/serving_bench.py --batch 64 --reps 3 --engines lane,rans64
step serving_mosaics_v2 python benchmarks/serving_bench.py --batch 8 --reps 3 --image data/val_mosaics --engines lane,rans64
step serving_single_v2 python benchmarks/serving_bench.py --reps 10 --engines rans32,rans64
step crossplat_chan_r5 python scripts/crossplatform_check.py --run runs_r5/gdn_chan_l001
step crossplat_joint_r3 python scripts/crossplatform_check.py --run runs_r3/joint_l001
step bench_probe_v2 python bench.py

echo "QUEUE R5E DONE $(date)"
