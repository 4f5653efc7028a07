#!/bin/bash
# Round-5 queue, part D: STE-warmup refinement (VERDICT item 4 follow-up).
# Part B measured: warmup-4-epochs lands -0.16 dB of GDN+noise at equal
# rate (vs -1.7 dB for clip-only) — the first stabilizer that nearly
# composes. Probe a longer warmup and the lambda=0.003 point.
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"
DEADLINE=${DEADLINE:-$(( $(date +%s) + 18000 ))}
TRAIN_DATA=/root/repo/data/train_patches
FAILED=0

while ! grep -q "QUEUE R5C DONE" runs_r5_queue_c.log 2>/dev/null; do sleep 60; done

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

# warmup 8 epochs (2312 steps of 289/epoch) at lambda=0.01
run_one gdn_ste_warm8_l001 0.01 --activation gdn --surrogate noise+ste --grad-clip 1.0 --ste-warmup-steps 2312
# warmup 4 epochs at lambda=0.003 (the second point of item 4's bar)
run_one gdn_ste_warm_l0003 0.003 --activation gdn --surrogate noise+ste --grad-clip 1.0 --ste-warmup-steps 1156

echo "=== waiting for background reports $(date) ==="
wait
echo "QUEUE R5D DONE failed=$FAILED $(date)"
exit $FAILED
