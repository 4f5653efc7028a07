#!/bin/bash
# Round-2 queue, part F (post-restore): the snapshot restore lost the
# hyperprior run dirs (logs survived). Retrain the hyperprior lambda sweep,
# the noise+ste surrogate run, rd_report them, then probe bench batch sizes.
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"

echo "=== bench validation on chip $(date) ==="
timeout 30m python bench.py > BENCH_mid_r2.json 2> runs_r2/bench_mid.log
echo "bench exit=$? $(date)"; cat BENCH_mid_r2.json

for lam in 0.003 0.03 0.1 0.3 0.01; do
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

echo "=== rd_report hyperprior sweep + ste $(date) ==="
timeout 2h python benchmarks/rd_report.py \
  runs_r2/hyp_l0003 runs_r2/hyp_l001 runs_r2/hyp_l003 runs_r2/hyp_l01 runs_r2/hyp_l03 \
  runs_r2/ste_l001 \
  > runs_r2/rd_hyp_ste.json 2> runs_r2/rd_hyp_ste.log
echo "exit=$? $(date)"
timeout 2h python benchmarks/rd_report.py --adaptive \
  runs_r2/hyp_l0003 runs_r2/hyp_l001 runs_r2/hyp_l003 runs_r2/hyp_l01 runs_r2/hyp_l03 \
  runs_r2/ste_l001 \
  > runs_r2/rd_hyp_ste_adaptive.json 2> runs_r2/rd_hyp_ste_adaptive.log
echo "exit=$? $(date)"

for b in 16 32; do
  echo "=== bench batch $b $(date) ==="
  timeout 30m env BENCH_BATCH=$b python bench.py 2>> runs_r2/bench_mid.log
  echo "exit=$?"
done
echo "QUEUE F DONE $(date)"
