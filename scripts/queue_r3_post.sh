#!/bin/bash
# Post-queue work: wait for the round-3 training queue to drain, then use the
# freed chip for (1) a channel-context training run — the model landed after
# the queue started — and (2) the remaining serving batch probes.
# LAST_START guards against running into the driver's end-of-round bench.
set -u
cd /root/repo
PY="python -m neural_network_image_compression_tpu"
START=$(cat runs_r3/.queue_start 2>/dev/null || date +%s)
LAST_START=$(( START + 18900 ))   # original queue start + 5h15m

while ! grep -q "QUEUE R3 DONE" runs_r3_queue.log 2>/dev/null; do sleep 60; done
echo "=== post-queue work $(date) ==="

if [ ! -f runs_r3/rd_chan_l001.json ] && [ "$(date +%s)" -lt "$LAST_START" ]; then
  echo "=== chan_l001 (lambda=0.01 --entropy-context channel) $(date) ==="
  timeout 40m $PY train --tpu-native --entropy-context channel \
    --data /root/reference/data/imagenet_patches \
    --val /root/reference/data/kodak_img \
    --run-dir runs_r3/chan_l001 \
    --epochs 30 --batch-size 64 \
    --rd-lambda 0.01 --rd-lambda-step 0 \
    --val-every-steps 2000 \
    > runs_r3/chan_l001.log 2>&1
  echo "exit=$? $(date)"
  if timeout 25m python benchmarks/rd_report.py runs_r3/chan_l001 \
      > runs_r3/.rd_chan.tmp 2> runs_r3/rd_chan_l001.log; then
    mv runs_r3/.rd_chan.tmp runs_r3/rd_chan_l001.json
  fi
  echo "rd_report chan_l001 exit=$? $(date)"
  timeout 20m python scripts/crossplatform_check.py --run runs_r3/chan_l001 \
    > runs_r3/crossplatform_chan.log 2>&1
  echo "crossplatform chan exit=$? $(date)"
fi

for b in 64 128; do
  if [ "$(date +%s)" -ge "$LAST_START" ]; then break; fi
  echo "=== bench batch $b $(date) ==="
  timeout 15m env BENCH_BATCH=$b python bench.py >> runs_r3/bench_probe.log 2>&1
  echo "exit=$?"
done
echo "POST QUEUE DONE $(date)"
