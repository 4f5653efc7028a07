#!/bin/bash
# Round-2 queue, part H (resumed session): retrain the hyperprior lambda
# sweep lost to the snapshot restore, then the noise+ste surrogate run,
# rd_report each run as soon as its training finishes so partial results
# land even if the round ends mid-queue.
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"

report() {
  tag=$1
  timeout 25m python benchmarks/rd_report.py "runs_r2/$tag" \
    > "runs_r2/rd_$tag.json" 2> "runs_r2/rd_$tag.log"
  echo "rd_report $tag exit=$? $(date)"
  timeout 25m python benchmarks/rd_report.py --adaptive "runs_r2/$tag" \
    > "runs_r2/rd_${tag}_adaptive.json" 2> "runs_r2/rd_${tag}_adaptive.log"
  echo "rd_report --adaptive $tag exit=$? $(date)"
}

for lam in 0.003 0.03 0.1 0.3; do
  tag="hyp_l${lam//./}"
  echo "=== hyper sweep $tag (lambda=$lam) $(date) ==="
  timeout 40m $PY train --tpu-native --entropy-context hyperprior \
    --data /root/reference/data/imagenet_patches \
    --val /root/reference/data/kodak_img \
    --run-dir "runs_r2/$tag" \
    --epochs 30 --batch-size 64 \
    --rd-lambda "$lam" --rd-lambda-step 0 \
    --val-every-steps 1000 \
    > "runs_r2/$tag.log" 2>&1
  echo "exit=$? $(date)"
  report "$tag"
done

echo "=== hyper lambda=0.01 (re-create lost run dir) $(date) ==="
timeout 40m $PY train --tpu-native --entropy-context hyperprior \
  --data /root/reference/data/imagenet_patches \
  --val /root/reference/data/kodak_img \
  --run-dir runs_r2/hyp_l001 \
  --epochs 30 --batch-size 64 \
  --rd-lambda 0.01 --rd-lambda-step 0 \
  --val-every-steps 1000 \
  > runs_r2/hyp_l001.log 2>&1
echo "exit=$? $(date)"
report hyp_l001

echo "=== noise+ste surrogate (lambda=0.01) $(date) ==="
timeout 40m $PY train --tpu-native --surrogate noise+ste \
  --data /root/reference/data/imagenet_patches \
  --val /root/reference/data/kodak_img \
  --run-dir runs_r2/ste_l001 \
  --epochs 30 --batch-size 64 \
  --rd-lambda 0.01 --rd-lambda-step 0 \
  --val-every-steps 1000 \
  > runs_r2/ste_l001.log 2>&1
echo "exit=$? $(date)"
report ste_l001

echo "QUEUE H DONE $(date)"
