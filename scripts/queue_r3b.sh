#!/bin/bash
# Round-3 queue, part B: lambda sweep of the NEW joint (hyperprior +
# checkerboard) context — anchors coded by the hyper Gaussian, non-anchors by
# a context net over [decoded anchors ++ raw hyper features]. Chains after
# part A; each run is rd_report'ed immediately so partial results land even
# if the round ends mid-queue. DEADLINE guards the round's end: no new run
# starts after it (the driver needs the chip for bench.py).
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"
DEADLINE=${DEADLINE:-$(( $(date +%s) + 6 * 3600 ))}

while ! grep -q "QUEUE R3A DONE" runs_r3_queue_a.log 2>/dev/null; do sleep 60; done

# Quick perf probes first (~10 min): serving batch size (the r2 probe was
# lost to the snapshot restore) and the bf16 Pallas-vs-XLA question.
for b in 16 32; do
  echo "=== bench batch $b $(date) ==="
  timeout 15m env BENCH_BATCH=$b python bench.py >> runs_r3/bench_probe.log 2>&1
  echo "exit=$?"
done
echo "=== pallas bench bf16 $(date) ==="
timeout 20m python benchmarks/pallas_bench.py 8 base > runs_r3/pallas_bench.log 2>&1
echo "exit=$?"

report() {
  tag=$1
  timeout 25m python benchmarks/rd_report.py "runs_r3/$tag" \
    > "runs_r3/rd_$tag.json" 2> "runs_r3/rd_$tag.log"
  echo "rd_report $tag exit=$? $(date)"
  timeout 25m python benchmarks/rd_report.py --adaptive "runs_r3/$tag" \
    > "runs_r3/rd_${tag}_adaptive.json" 2> "runs_r3/rd_${tag}_adaptive.log"
  echo "rd_report --adaptive $tag exit=$? $(date)"
}

mkdir -p runs_r3
run_joint() {
  lam=$1; shift
  tag=$1; shift
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "=== deadline passed; skipping $tag ==="
    return
  fi
  echo "=== joint sweep $tag (lambda=$lam $*) $(date) ==="
  timeout 45m $PY train --tpu-native --entropy-context joint "$@" \
    --data /root/reference/data/imagenet_patches \
    --val /root/reference/data/kodak_img \
    --run-dir "runs_r3/$tag" \
    --epochs 30 --batch-size 64 \
    --rd-lambda "$lam" --rd-lambda-step 0 \
    --val-every-steps 1000 \
    > "runs_r3/$tag.log" 2>&1
  echo "exit=$? $(date)"
  report "$tag"
}

run_joint 0.01  joint_l001
echo "=== cross-platform det check on the joint checkpoint $(date) ==="
timeout 20m python scripts/crossplatform_check.py --run runs_r3/joint_l001 \
  > runs_r3/crossplatform_joint.log 2>&1
echo "exit=$?"
run_joint 0.003 joint_l0003
run_joint 0.03  joint_l003
run_joint 0.1   joint_l01
# Combination probe: joint context + noise+ste surrogate (both round-2/3
# wins) — the candidate round-3 flagship.
run_joint 0.01 joint_ste_l001 --surrogate noise+ste
echo "QUEUE R3B DONE $(date)"
