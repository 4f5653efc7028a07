#!/bin/bash
# Round-2 queue, part C: waits for part B (deep preset), then: bench
# validation on chip, hyperprior lambda sweep (CLI choices fixed), and the
# noise+ste surrogate experiment.
set -u
cd /root/repo
while ! grep -q "QUEUE B DONE" runs_r2_queue_b.log 2>/dev/null; do sleep 60; done
PY="python -m neural_network_image_compression_tpu"

echo "=== bench validation on chip $(date) ==="
timeout 30m python bench.py > BENCH_mid_r2.json 2> runs_r2/bench_mid.log
echo "bench exit=$? $(date)"; cat BENCH_mid_r2.json

for lam in 0.01 0.1 0.3 0.003 0.03; do
  tag="hyp_l${lam//./}"
  echo "=== hyper sweep $tag (lambda=$lam) $(date) ==="
  timeout 4h $PY train --tpu-native --entropy-context hyperprior \
    --data /root/reference/data/imagenet_patches \
    --val /root/reference/data/kodak_img \
    --run-dir "runs_r2/$tag" \
    --epochs 30 --batch-size 64 \
    --rd-lambda "$lam" --rd-lambda-step 0 \
    --val-every-steps 1000 \
    > "runs_r2/$tag.log" 2>&1
  echo "exit=$? $(date)"
done

echo "=== noise+ste surrogate (lambda=0.01) $(date) ==="
timeout 4h $PY train --tpu-native --surrogate noise+ste \
  --data /root/reference/data/imagenet_patches \
  --val /root/reference/data/kodak_img \
  --run-dir runs_r2/ste_l001 \
  --epochs 30 --batch-size 64 \
  --rd-lambda 0.01 --rd-lambda-step 0 \
  --val-every-steps 1000 \
  > runs_r2/ste_l001.log 2>&1
echo "exit=$? $(date)"
echo "QUEUE C DONE $(date)"
