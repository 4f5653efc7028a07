#!/bin/bash
# Round-2 TPU training queue: lambda sweep on the integer-grid flagship,
# then the reference-faithful parity anchor to full convergence.
# Runs sequentially (the chip is exclusive). Logs under runs_r2/.
set -u
cd /root/repo
mkdir -p runs_r2
PY="python -m neural_network_image_compression_tpu"

for lam in 0.003 0.01 0.03 0.1 0.3; do
  tag="int_l${lam//./}"
  echo "=== sweep $tag (lambda=$lam) $(date) ==="
  timeout 4h $PY train --tpu-native \
    --data /root/reference/data/imagenet_patches \
    --val /root/reference/data/kodak_img \
    --run-dir "runs_r2/$tag" \
    --epochs 30 --batch-size 64 \
    --rd-lambda "$lam" --rd-lambda-step 0 \
    --val-every-steps 500 \
    > "runs_r2/$tag.log" 2>&1
  echo "exit=$? $(date)"
done

echo "=== faithful anchor resume to 30 epochs $(date) ==="
timeout 6h $PY train --reference-faithful \
  --data /root/reference/data/imagenet_patches \
  --val /root/reference/data/kodak_img \
  --run-dir runs/faithful2 \
  --epochs 30 --batch-size 64 \
  --compute-dtype bfloat16 \
  --val-every-steps 300 \
  --resume \
  > runs_r2/faithful2_resume.log 2>&1
echo "exit=$? $(date)"
echo "QUEUE DONE $(date)"
