#!/bin/bash
# Round-5 queue, part B: GDN+STE composition (VERDICT r4 item 4).
# Round 4 measured: plain noise+ste diverges with GDN (RESULTS.md §8.3);
# grad-clip 1.0 rescues stability but lands -1.7 dB under GDN+noise. The two
# untried stabilizers target the measured mechanism (the norm params
# amplifying under STE's unsmoothed gradient):
#   - --gdn-lr-scale 0.1 : 10x smaller Adam lr for GDN beta/gamma only
#   - --ste-warmup-steps 1156 : ~4 epochs of noise surrogate first
# Both runs keep grad-clip 1.0 as the backstop. Waits for part A.
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"
DEADLINE=${DEADLINE:-$(( $(date +%s) + 18000 ))}   # now+5h
TRAIN_DATA=/root/repo/data/train_patches
FAILED=0

while ! grep -q "QUEUE R5A DONE" runs_r5_queue.log 2>/dev/null; do sleep 60; done

report_bg() {
  tag=$1
  (
    timeout 45m python benchmarks/rd_report.py --cpu "runs_r5/$tag" \
      > "runs_r5/rd_$tag.json" 2> "runs_r5/rd_$tag.log"
    echo "rd_report $tag exit=$? $(date)" >> runs_r5/reports.log
  ) &
}

train_once() {
  tag=$1; lam=$2; log=$3; shift 3
  timeout 40m $PY train --tpu-native \
    --data "$TRAIN_DATA" \
    --val /root/reference/data/kodak_img \
    --run-dir "runs_r5/$tag" \
    --epochs 30 --batch-size 64 \
    --rd-lambda "$lam" --rd-lambda-step 0 \
    --val-every-steps 2000 \
    "$@" > "$log" 2>&1
  echo "exit=$? $(date)"
}

run_one() {
  tag=$1; lam=$2; shift 2
  if [ -d "runs_r5/$tag/checkpoints" ] && [ -n "$(ls -A "runs_r5/$tag/checkpoints" 2>/dev/null)" ]; then
    echo "=== $tag already trained; skipping ==="
    return
  fi
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "=== deadline passed; skipping $tag ==="
    return
  fi
  echo "=== $tag (lambda=$lam $*) $(date) ==="
  train_once "$tag" "$lam" "runs_r5/$tag.log" "$@"
  if [ ! -d "runs_r5/$tag/checkpoints" ] || [ -z "$(ls -A "runs_r5/$tag/checkpoints" 2>/dev/null)" ]; then
    echo "!!! RUN $tag produced no checkpoint — retrying once $(date)"
    train_once "$tag" "$lam" "runs_r5/$tag.retry.log" "$@"
  fi
  if [ ! -d "runs_r5/$tag/checkpoints" ] || [ -z "$(ls -A "runs_r5/$tag/checkpoints" 2>/dev/null)" ]; then
    echo "!!!!!! RUN $tag FAILED TWICE (no checkpoint) — see runs_r5/$tag*.log"
    FAILED=$((FAILED + 1))
    touch "runs_r5/$tag.FAILED"
    return
  fi
  report_bg "$tag"
}

mkdir -p runs_r5

run_one gdn_ste_lrs_l001  0.01 --activation gdn --surrogate noise+ste --grad-clip 1.0 --gdn-lr-scale 0.1
run_one gdn_ste_warm_l001 0.01 --activation gdn --surrogate noise+ste --grad-clip 1.0 --ste-warmup-steps 1156
run_one gdn_ste_both_l001 0.01 --activation gdn --surrogate noise+ste --grad-clip 1.0 --gdn-lr-scale 0.1 --ste-warmup-steps 1156

echo "=== waiting for background reports $(date) ==="
wait
echo "QUEUE R5B DONE failed=$FAILED $(date)"
exit $FAILED
