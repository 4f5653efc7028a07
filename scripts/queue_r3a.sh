#!/bin/bash
# Round-3 queue, part A: the noise+ste surrogate lambda sweep (RESULTS.md
# round-2 finding: ste beats plain noise by ~0.5 dB at equal rate at
# lambda=0.01 — this sweep fills the rest of the curve). 3 points; the
# lambda=0.01 point already exists (runs_r2/ste_l001).
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"

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
for lam in 0.003 0.03 0.1; do
  tag="ste_l${lam//./}"
  echo "=== ste sweep $tag (lambda=$lam) $(date) ==="
  timeout 40m $PY train --tpu-native --surrogate noise+ste \
    --data /root/reference/data/imagenet_patches \
    --val /root/reference/data/kodak_img \
    --run-dir "runs_r3/$tag" \
    --epochs 30 --batch-size 64 \
    --rd-lambda "$lam" --rd-lambda-step 0 \
    --val-every-steps 1000 \
    > "runs_r3/$tag.log" 2>&1
  echo "exit=$? $(date)"
  report "$tag"
done
echo "QUEUE R3A DONE $(date)"
