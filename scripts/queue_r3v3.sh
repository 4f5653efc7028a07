#!/bin/bash
# Round-3 queue v3 — fixes the GDN report stall: rd_report on the axon TPU
# path hits the 25m timeout for GDN checkpoints (runs_r3/rd_gdn_l001.log),
# while the same report completes in ~11 min on CPU. v3 therefore runs ALL
# reports with --cpu in the BACKGROUND, overlapping the next training run on
# the chip — reports cost zero chip wall-time. Training is skipped for runs
# that already have checkpoints; reports for runs that already have a json.
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"
DEADLINE=${DEADLINE:-16200}
START=$(cat runs_r3/.queue_start 2>/dev/null || date +%s)
END=$(( START + DEADLINE ))

report_bg() {
  tag=$1
  if [ -f "runs_r3/rd_$tag.json" ]; then return; fi
  (
    if timeout 35m python benchmarks/rd_report.py --cpu "runs_r3/$tag" \
        > "runs_r3/.rd_$tag.tmp" 2> "runs_r3/rd_$tag.log"; then
      mv "runs_r3/.rd_$tag.tmp" "runs_r3/rd_$tag.json"
    fi
    echo "rd_report(cpu,bg) $tag done $(date)" >> runs_r3/reports_bg.log
  ) &
}

run_one() {
  tag=$1; lam=$2; shift 2
  if [ ! -d "runs_r3/$tag/checkpoints" ]; then
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
  fi
  report_bg "$tag"
}

mkdir -p runs_r3

run_one gdn_ste_l001  0.01  --activation gdn --surrogate noise+ste
run_one gdn_l003      0.03  --activation gdn
run_one gdn_l0003     0.003 --activation gdn
run_one gdn_l01       0.1   --activation gdn
run_one joint_ste_l001 0.01 --entropy-context joint --surrogate noise+ste
run_one gdn_ste_l003  0.03  --activation gdn --surrogate noise+ste
run_one gdn_ste_l0003 0.003 --activation gdn --surrogate noise+ste
run_one gdn_ste_l01   0.1   --activation gdn --surrogate noise+ste
run_one joint_l0003 0.003 --entropy-context joint
run_one joint_l003  0.03  --entropy-context joint
run_one joint_l01   0.1   --entropy-context joint

wait   # drain background CPU reports before declaring the queue done
echo "QUEUE R3 DONE $(date)"
