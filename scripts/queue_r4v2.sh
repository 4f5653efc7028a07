#!/bin/bash
# Round-4 queue v2 (replaces queue_r4.sh + queue_r4b.sh mid-flight).
# Reason: the GDN + noise+ste combination DIVERGES (runs_r4/gdn_ste_l001
# final model decodes at 5.2 dB; training loss oscillates at 4x the
# GDN+noise level) — so the v1 queue's context-matrix runs, which all used
# noise+ste, would have wasted the chip. v2:
#   1. GDN x context matrix with the PROVEN-stable noise surrogate.
#   2. Grad-clipped GDN+STE probe (is clipping enough to rescue STE?).
#   3. Mosaic-crop (256^2) hyper-generalization runs.
#   4. Serving bench + cross-platform check on the best GDN checkpoint.
# Skips any tag whose checkpoints dir is non-empty, so it resumes cleanly
# over everything v1 finished.
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"
# No new chip work after 09:15 UTC (driver bench needs the chip at round end).
DEADLINE=${DEADLINE:-1787303700}
TRAIN_DATA=/root/repo/data/train_patches
FAILED=0

# Wait for any orphan training process from the killed v1 queue to release
# the chip (check only — never kill by pattern).
while pgrep -f "neural_network_image_compression_tpu train" > /dev/null; do
  echo "waiting for in-flight training to finish $(date)"
  sleep 60
done

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

train_once() {
  tag=$1; lam=$2; log=$3; shift 3
  timeout 40m $PY train --tpu-native \
    --data "$TRAIN_DATA" \
    --val /root/reference/data/kodak_img \
    --run-dir "runs_r4/$tag" \
    --epochs 30 --batch-size 64 \
    --rd-lambda "$lam" --rd-lambda-step 0 \
    --val-every-steps 2000 \
    "$@" > "$log" 2>&1
  echo "exit=$? $(date)"
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
  train_once "$tag" "$lam" "runs_r4/$tag.log" "$@"
  if [ ! -d "runs_r4/$tag/checkpoints" ] || [ -z "$(ls -A "runs_r4/$tag/checkpoints" 2>/dev/null)" ]; then
    echo "!!! RUN $tag produced no checkpoint — retrying once $(date)"
    train_once "$tag" "$lam" "runs_r4/$tag.retry.log" "$@"
  fi
  if [ ! -d "runs_r4/$tag/checkpoints" ] || [ -z "$(ls -A "runs_r4/$tag/checkpoints" 2>/dev/null)" ]; then
    echo "!!!!!! RUN $tag FAILED TWICE (no checkpoint) — see runs_r4/$tag*.log"
    FAILED=$((FAILED + 1))
    touch "runs_r4/$tag.FAILED"
    return
  fi
  report_bg "$tag"
}

mkdir -p runs_r4

# rd_report the orphaned gdn_ste_l0003 (honest record of the divergence).
if [ ! -f runs_r4/rd_gdn_ste_l0003.json ] && [ -d runs_r4/gdn_ste_l0003/checkpoints ]; then
  report_bg gdn_ste_l0003
fi

# --- 1. GDN x context matrix, noise surrogate (stable) ---
run_one gdn_chan_l001  0.01  --activation gdn --entropy-context channel
run_one gdn_joint_l001 0.01  --activation gdn --entropy-context joint

# --- 2. can gradient clipping rescue GDN+STE? (one probe first) ---
run_one gdn_ste_clip_l001 0.01 --activation gdn --surrogate noise+ste --grad-clip 1.0

# --- 3. hyper-side generalization: 256x256 mosaic crops ---
run_one joint_mos2_l001     0.01 --entropy-context joint --batch-size 16 --mosaic 2
run_one gdn_joint_mos2_l001 0.01 --activation gdn --entropy-context joint --batch-size 16 --mosaic 2

# --- 4. fill the GDN context sweeps (noise) ---
run_one gdn_chan_l0003  0.003 --activation gdn --entropy-context channel
run_one gdn_chan_l01    0.1   --activation gdn --entropy-context channel
run_one gdn_joint_l0003 0.003 --activation gdn --entropy-context joint
run_one gdn_joint_l01   0.1   --activation gdn --entropy-context joint

# --- 5. stretch ---
run_one gdn_mos2_l001      0.01 --activation gdn --batch-size 16 --mosaic 2
run_one gdn_chan_mos2_l001 0.01 --activation gdn --entropy-context channel --batch-size 16 --mosaic 2

# --- 6. serving bench + cross-platform det check on the proven flagship ---
FLAG=runs_r3/gdn_l001
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
echo "QUEUE R4V2 DONE failed=$FAILED $(date)"
exit $FAILED
