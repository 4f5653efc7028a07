#!/bin/bash
# Round-3 queue v2 — reprioritized after joint_l001's result landed:
# the joint (hyper+checkerboard) context scores 3.04 bpp @ 26.89 dB on
# kodim21 vs the checkerboard flagship's 1.94 bpp @ 26.89 dB at the same
# lambda (hyper-side conditioning overfits 128x128 patch statistics — the
# same covariate-shift failure as the r2 hyperprior finding). So the
# remaining joint lambda sweep is demoted to the tail and the GDN sweep +
# GDN x STE combo (the candidate round-3 flagship) moves up.
# Rerun-safe: runs with an rd_<tag>.json are skipped; reports write to a tmp
# file and only land on rd_report success (review fix).
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"
DEADLINE=${DEADLINE:-16200}   # seconds of queue budget from original start

# anchor the deadline to the ORIGINAL queue start so a restart cannot extend
# the round past the driver's bench window
START=$(cat runs_r3/.queue_start 2>/dev/null || date +%s)
echo "$START" > runs_r3/.queue_start
END=$(( START + DEADLINE ))

report() {
  tag=$1
  if timeout 25m python benchmarks/rd_report.py "runs_r3/$tag" \
      > "runs_r3/.rd_$tag.tmp" 2> "runs_r3/rd_$tag.log"; then
    mv "runs_r3/.rd_$tag.tmp" "runs_r3/rd_$tag.json"
  fi
  echo "rd_report $tag exit=$? $(date)"
  if timeout 25m python benchmarks/rd_report.py --adaptive "runs_r3/$tag" \
      > "runs_r3/.rd_${tag}_a.tmp" 2> "runs_r3/rd_${tag}_adaptive.log"; then
    mv "runs_r3/.rd_${tag}_a.tmp" "runs_r3/rd_${tag}_adaptive.json"
  fi
  echo "rd_report --adaptive $tag exit=$? $(date)"
}

run_one() {
  tag=$1; lam=$2; shift 2
  if [ -f "runs_r3/rd_$tag.json" ]; then
    echo "=== $tag already reported; skipping ==="
    return
  fi
  if [ "$(date +%s)" -ge "$END" ]; then
    echo "=== deadline passed; skipping $tag ==="
    return
  fi
  echo "=== $tag (lambda=$lam $*) $(date) ==="
  timeout 40m $PY train --tpu-native "$@" \
    --data /root/reference/data/imagenet_patches \
    --val /root/reference/data/kodak_img \
    --run-dir "runs_r3/$tag" \
    --epochs 30 --batch-size 64 \
    --rd-lambda "$lam" --rd-lambda-step 0 \
    --val-every-steps 2000 \
    > "runs_r3/$tag.log" 2>&1
  echo "exit=$? $(date)"
  report "$tag"
}

mkdir -p runs_r3

if [ ! -f runs_r3/crossplatform_joint.log ]; then
  echo "=== cross-platform det check on the joint checkpoint $(date) ==="
  timeout 20m python scripts/crossplatform_check.py --run runs_r3/joint_l001 \
    > runs_r3/crossplatform_joint.log 2>&1
  echo "exit=$?"
fi

# --- 1. noise+ste sweep (lambda=0.01 exists from r2: runs_r2/ste_l001) ---
run_one ste_l0003 0.003 --surrogate noise+ste
run_one ste_l003  0.03  --surrogate noise+ste
run_one ste_l01   0.1   --surrogate noise+ste

# --- 2. GDN sweep + GDN x STE combo (candidate round-3 flagship) ---
run_one gdn_l001      0.01  --activation gdn
run_one gdn_ste_l001  0.01  --activation gdn --surrogate noise+ste
run_one gdn_l003      0.03  --activation gdn
run_one gdn_l0003     0.003 --activation gdn
run_one gdn_l01       0.1   --activation gdn

# --- 3. does STE rescue the joint context's generalization? ---
run_one joint_ste_l001 0.01 --entropy-context joint --surrogate noise+ste

# --- 4. tail: remaining GDN x STE, then the demoted joint sweep ---
run_one gdn_ste_l003  0.03  --activation gdn --surrogate noise+ste
run_one gdn_ste_l0003 0.003 --activation gdn --surrogate noise+ste
run_one gdn_ste_l01   0.1   --activation gdn --surrogate noise+ste
run_one joint_l0003 0.003 --entropy-context joint
run_one joint_l003  0.03  --entropy-context joint
run_one joint_l01   0.1   --entropy-context joint

echo "QUEUE R3 DONE $(date)"
