#!/bin/bash
# Round-2 queue, part G: replaces the tail of queue F (stopped by PID after
# hyp_l01 launched) so chip work fits the round budget. Waits for the
# in-flight hyp_l01 trainer, trains the remaining lambda points, runs the
# noise+ste run only if there is still budget, then the tap-concat A/B and
# batch-size benches so the chip is free well before round end.
# Usage: queue_r2g.sh <pid-of-inflight-hyp_l01-timeout>
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"
DEADLINE_STE=$(date -d "04:40" +%s 2>/dev/null || echo 0)

echo "=== waiting for in-flight hyp_l01 (pid $1) $(date) ==="
while kill -0 "$1" 2>/dev/null; do sleep 20; done
echo "hyp_l01 done $(date)"

for lam in 0.3 0.01; do
  tag="hyp_l${lam//./}"
  echo "=== hyper sweep $tag (lambda=$lam) $(date) ==="
  timeout 70m $PY train --tpu-native --entropy-context hyperprior \
    --data /root/reference/data/imagenet_patches \
    --val /root/reference/data/kodak_img \
    --run-dir "runs_r2/$tag" \
    --epochs 30 --batch-size 64 \
    --rd-lambda "$lam" --rd-lambda-step 0 \
    --val-every-steps 1000 \
    > "runs_r2/$tag.log" 2>&1
  echo "exit=$? $(date)"
done

if [ "$(date +%s)" -lt "$DEADLINE_STE" ]; then
  echo "=== noise+ste surrogate (lambda=0.01) $(date) ==="
  timeout 50m $PY train --tpu-native --surrogate noise+ste \
    --data /root/reference/data/imagenet_patches \
    --val /root/reference/data/kodak_img \
    --run-dir runs_r2/ste_l001 \
    --epochs 30 --batch-size 64 \
    --rd-lambda 0.01 --rd-lambda-step 0 \
    --val-every-steps 1000 \
    > runs_r2/ste_l001.log 2>&1
  echo "exit=$? $(date)"
else
  echo "=== skipping ste run (past 04:40 budget) $(date) ==="
fi

echo "=== pallas tap-concat A/B $(date) ==="
timeout 25m python benchmarks/pallas_bench.py 4 base,deep \
  > runs_r2/pallas_tap.log 2>&1
echo "exit=$? $(date)"

for b in 16 32; do
  echo "=== bench batch $b $(date) ==="
  timeout 20m env BENCH_BATCH=$b python bench.py 2>> runs_r2/bench_mid.log
  echo "exit=$?"
done
echo "QUEUE G DONE $(date)"
