#!/bin/bash
# Round-5 training queue, part A: complete the GDN x context matrix
# (VERDICT r4 item 5). One chip, sequential training; R-D reports run on CPU
# in the background so the chip never idles (round-3/4 pattern).
#   1. gdn_chan_l001 — re-run the r4 channel-context run that hung at epoch
#      27/30 (axon runtime stall), to a full 30 epochs.
#   2. lambda=0.03 points for all three contexts (checkerboard/channel/joint)
#      to pin the flagship crossover that config.flagship() currently
#      hardcodes from a 3-point sweep.
# All runs train on data/train_patches (18,488; scripts/make_eval_split.py)
# with the noise surrogate — the same convention as every r4 matrix row.
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"
DEADLINE=${DEADLINE:-$(( $(date +%s) + 14400 ))}   # default now+4h
TRAIN_DATA=/root/repo/data/train_patches
FAILED=0

report_bg() {
  tag=$1
  (
    timeout 45m python benchmarks/rd_report.py --cpu "runs_r5/$tag" \
      > "runs_r5/rd_$tag.json" 2> "runs_r5/rd_$tag.log"
    echo "rd_report $tag exit=$? $(date)" >> runs_r5/reports.log
    timeout 75m python benchmarks/rd_report.py --cpu --val data/val_mosaics \
      "runs_r5/$tag" \
      > "runs_r5/rd_${tag}_mosaics.json" 2> "runs_r5/rd_${tag}_mosaics.log"
    echo "rd_report mosaics $tag exit=$? $(date)" >> runs_r5/reports.log
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

# --- 1. the hung channel run, re-run to completion ---
run_one gdn_chan_l001 0.01 --activation gdn --entropy-context channel

# --- 2. lambda=0.03 crossover points, all three contexts ---
run_one gdn_l003      0.03 --activation gdn
run_one gdn_joint_l003 0.03 --activation gdn --entropy-context joint
run_one gdn_chan_l003 0.03 --activation gdn --entropy-context channel

echo "=== waiting for background reports $(date) ==="
wait
echo "QUEUE R5A DONE failed=$FAILED $(date)"
exit $FAILED
