#!/bin/bash
# Round-4 training queue. One chip, sequential training; R-D reports run on
# CPU in the background so the chip never idles (round-3 pattern). Priorities
# (VERDICT r3 "Next round" items 1, 3, 4):
#   1. gdn_ste_l001 — re-run the silently-dead GDN+STE combination, then its
#      lambda sweep (the two largest measured R-D levers were never combined).
#   2. GDN x channel-context and GDN x joint-context sweeps (the full
#      GDN x context x surrogate matrix; channel had ONE lambda point).
#   3. joint-context with 2x2 mosaic training crops (--mosaic 2): the
#      hyper-side generalization fix (RESULTS.md §7.2 root cause).
# All round-4 runs train on data/train_patches (18,488 patches; 512 held out
# by scripts/make_eval_split.py) so the mosaic/heldout eval sets are clean.
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"
DEADLINE=${DEADLINE:-$(( $(date +%s) + 19800 ))}   # default now+5.5h
TRAIN_DATA=/root/repo/data/train_patches
FAILED=0

report_bg() {
  # CPU reports in the background: kodim21 (reference's own val image) and
  # the 8 held-out 1024x1024 mosaics (never-trained data, large-image stats).
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
  # Extra args LAST so they can override the defaults (argparse: last wins).
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
  # FAIL LOUDLY when no checkpoint landed (VERDICT r3: the r3 gdn_ste run
  # died silently and was only noticed at judging). One retry, then a hard
  # FAILED marker that the queue's exit status carries.
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

# --- 1. GDN + STE: the dead r3 run, then the sweep ---
run_one gdn_ste_l001  0.01  --activation gdn --surrogate noise+ste
run_one gdn_ste_l0003 0.003 --activation gdn --surrogate noise+ste
run_one gdn_ste_l003  0.03  --activation gdn --surrogate noise+ste
run_one gdn_ste_l01   0.1   --activation gdn --surrogate noise+ste

# --- 2. GDN x context matrix (all with STE — measured best surrogate) ---
run_one gdn_chan_l001  0.01  --activation gdn --surrogate noise+ste --entropy-context channel
run_one gdn_joint_l001 0.01  --activation gdn --surrogate noise+ste --entropy-context joint

# --- 3. hyper-side generalization: 256x256 mosaic crops (same pixels/step:
#        batch 16 x 256^2 == batch 64 x 128^2), joint context ---
run_one joint_mos2_l001     0.01 --entropy-context joint --batch-size 16 --mosaic 2
run_one gdn_joint_mos2_l001 0.01 --activation gdn --surrogate noise+ste --entropy-context joint --batch-size 16 --mosaic 2

# --- 4. fill the context sweeps ---
run_one gdn_chan_l0003  0.003 --activation gdn --surrogate noise+ste --entropy-context channel
run_one gdn_chan_l01    0.1   --activation gdn --surrogate noise+ste --entropy-context channel
run_one gdn_joint_l0003 0.003 --activation gdn --surrogate noise+ste --entropy-context joint
run_one gdn_joint_l01   0.1   --activation gdn --surrogate noise+ste --entropy-context joint

# --- 5. stretch: channel-context mosaic point; GDN mosaic checkerboard ---
run_one gdn_chan_mos2_l001 0.01 --activation gdn --surrogate noise+ste --entropy-context channel --batch-size 16 --mosaic 2
run_one gdn_mos2_l001      0.01 --activation gdn --surrogate noise+ste --batch-size 16 --mosaic 2

echo "=== waiting for background reports $(date) ==="
wait
echo "QUEUE R4 DONE failed=$FAILED $(date)"
exit $FAILED
