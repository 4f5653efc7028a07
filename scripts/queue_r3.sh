#!/bin/bash
# Round-3 combined queue (replaces queue_r3a.sh/queue_r3b.sh which never ran
# before the session restart). One chip, sequential. Priorities:
#   1. joint (hyperprior+checkerboard) context at the flagship lambda — the
#      new round-3 model must be validated on hardware first.
#   2. noise+ste surrogate lambda sweep (round-2 finding: +0.5 dB at equal
#      rate over plain noise at lambda=0.01; fill the curve).
#   3. joint lambda sweep + joint x ste combination (candidate flagship).
#   4. stretch: deep-preset sweep points, longer flagship run.
# Each run is rd_report'ed immediately so partial results land even if the
# round ends mid-queue. DEADLINE guards the round's end (driver needs the
# chip for bench.py).
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"
DEADLINE=${DEADLINE:-$(( $(date +%s) + 16200 ))}   # default now+4.5h

report() {
  tag=$1
  timeout 25m python benchmarks/rd_report.py "runs_r3/$tag" \
    > "runs_r3/rd_$tag.json" 2> "runs_r3/rd_$tag.log"
  echo "rd_report $tag exit=$? $(date)"
  timeout 25m python benchmarks/rd_report.py --adaptive "runs_r3/$tag" \
    > "runs_r3/rd_${tag}_adaptive.json" 2> "runs_r3/rd_${tag}_adaptive.log"
  echo "rd_report --adaptive $tag exit=$? $(date)"
}

run_one() {
  tag=$1; lam=$2; shift 2
  if [ -f "runs_r3/rd_$tag.json" ]; then
    echo "=== $tag already reported; skipping ==="
    return
  fi
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
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

# --- 0. quick perf probes (~30 min): serving batch size (informs the
# BENCH_BATCH default for the driver's end-of-round bench) and the bf16
# Pallas-vs-XLA question (VERDICT r1 weak item 4). Run FIRST so they land
# even though the training queue outlives the deadline.
if [ ! -f runs_r3/bench_probe.log ]; then
  for b in 16 32; do
    echo "=== bench batch $b $(date) ==="
    timeout 15m env BENCH_BATCH=$b python bench.py >> runs_r3/bench_probe.log 2>&1
    echo "exit=$?"
  done
  echo "=== pallas bench bf16 $(date) ==="
  timeout 20m python benchmarks/pallas_bench.py 8 base > runs_r3/pallas_bench.log 2>&1
  echo "exit=$?"
fi

# --- 1. the new joint model, flagship lambda ---
run_one joint_l001 0.01 --entropy-context joint

echo "=== cross-platform det check on the joint checkpoint $(date) ==="
timeout 20m python scripts/crossplatform_check.py --run runs_r3/joint_l001 \
  > runs_r3/crossplatform_joint.log 2>&1
echo "exit=$?"

# --- 2. noise+ste sweep (lambda=0.01 exists from r2: runs_r2/ste_l001) ---
run_one ste_l0003 0.003 --surrogate noise+ste
run_one ste_l003  0.03  --surrogate noise+ste
run_one ste_l01   0.1   --surrogate noise+ste

# --- 3. joint sweep + combination ---
run_one joint_ste_l001 0.01 --entropy-context joint --surrogate noise+ste
run_one joint_l0003 0.003 --entropy-context joint
run_one joint_l003  0.03  --entropy-context joint
run_one joint_l01   0.1   --entropy-context joint

# --- 3b. gated slot: GDN-activation preset (code lands mid-round; the
# flag file is touched once tests pass, so this only runs against a
# committed implementation) ---
if [ -f runs_r3/.gdn_ready ]; then
  run_one gdn_l001  0.01  --activation gdn
  run_one gdn_l003  0.03  --activation gdn
  run_one gdn_l0003 0.003 --activation gdn
  run_one gdn_l01   0.1   --activation gdn
fi

# --- 4. stretch: joint+ste at remaining lambdas ---
run_one joint_ste_l0003 0.003 --entropy-context joint --surrogate noise+ste
run_one joint_ste_l003  0.03  --entropy-context joint --surrogate noise+ste
run_one joint_ste_l01   0.1   --entropy-context joint --surrogate noise+ste

echo "QUEUE R3 DONE $(date)"
