#!/bin/bash
# Round-4 stage B: runs after queue_r4.sh completes (watcher in
# runs_r4_queue_b.log). Contingent work that needs the chip:
#   1. Grad-clipped GDN+STE (the un-clipped run oscillates — RESULTS.md r4).
#   2. End-to-end serving bench on the GDN flagship checkpoint
#      (VERDICT r3 item 5: container-in -> pixels-out numbers never ran).
#   3. Cross-platform deterministic-container check on a GDN checkpoint.
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"
# Absolute: no new chip work after 09:15 UTC (driver bench needs the chip
# at round end).
DEADLINE=${DEADLINE:-1787303700}
TRAIN_DATA=/root/repo/data/train_patches

report_bg() {
  tag=$1
  (
    timeout 45m python benchmarks/rd_report.py --cpu "runs_r4/$tag" \
      > "runs_r4/rd_$tag.json" 2> "runs_r4/rd_$tag.log"
    echo "rd_report $tag exit=$? $(date)" >> runs_r4/reports.log
    timeout 75m python benchmarks/rd_report.py --cpu --val data/val_mosaics \
      "runs_r4/$tag" \
      > "runs_r4/rd_${tag}_mosaics.json" 2> "runs_r4/rd_${tag}_mosaics.log"
    echo "rd_report mosaics $tag exit=$? $(date)" >> runs_r4/reports.log
  ) &
}

run_one() {
  tag=$1; lam=$2; shift 2
  if [ -d "runs_r4/$tag/checkpoints" ] && [ -n "$(ls -A "runs_r4/$tag/checkpoints" 2>/dev/null)" ]; then
    echo "=== $tag already trained; skipping ==="
    return
  fi
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "=== deadline passed; skipping $tag ==="
    return
  fi
  echo "=== $tag (lambda=$lam $*) $(date) ==="
  timeout 40m $PY train --tpu-native \
    --data "$TRAIN_DATA" \
    --val /root/reference/data/kodak_img \
    --run-dir "runs_r4/$tag" \
    --epochs 30 --batch-size 64 \
    --rd-lambda "$lam" --rd-lambda-step 0 \
    --val-every-steps 2000 \
    "$@" > "runs_r4/$tag.log" 2>&1
  echo "exit=$? $(date)"
  if [ ! -d "runs_r4/$tag/checkpoints" ] || [ -z "$(ls -A "runs_r4/$tag/checkpoints" 2>/dev/null)" ]; then
    echo "!!!!!! RUN $tag FAILED (no checkpoint) — see runs_r4/$tag.log"
    touch "runs_r4/$tag.FAILED"
    return
  fi
  report_bg "$tag"
}

# --- 1. stabilized GDN+STE ---
run_one gdn_ste_clip_l001 0.01 --activation gdn --surrogate noise+ste --grad-clip 1.0

# --- 2. serving bench on the best available GDN checkpoint (TPU + CPU) ---
FLAG=""
for cand in runs_r4/gdn_ste_clip_l001 runs_r4/gdn_ste_l001 runs_r3/gdn_l001; do
  if [ -d "$cand/checkpoints" ] && [ -n "$(ls -A "$cand/checkpoints" 2>/dev/null)" ]; then
    FLAG=$cand; break
  fi
done
if [ -n "$FLAG" ]; then
  echo "=== serving bench on $FLAG (TPU) $(date) ==="
  timeout 30m python benchmarks/serving_bench.py --run "$FLAG" --reps 10 \
    > runs_r4/serving_bench_tpu.json 2> runs_r4/serving_bench_tpu.log
  echo "exit=$?"
  echo "=== serving bench on $FLAG (CPU) $(date) ==="
  timeout 30m python benchmarks/serving_bench.py --run "$FLAG" --reps 5 --cpu \
    > runs_r4/serving_bench_cpu.json 2> runs_r4/serving_bench_cpu.log
  echo "exit=$?"
  echo "=== cross-platform det check on $FLAG $(date) ==="
  timeout 25m python scripts/crossplatform_check.py --run "$FLAG" \
    > runs_r4/crossplatform_gdn.log 2>&1
  echo "exit=$?"
fi

echo "=== waiting for background reports $(date) ==="
wait
echo "QUEUE R4B DONE $(date)"
