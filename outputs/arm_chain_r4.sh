#!/bin/bash
# r4 arm chain (relaunched after the 05:36 session crash killed the first one).
# stdout -> .jsonl (one JSON line per eval), stderr -> .log, like the flagship arm.
cd /root/repo
python benchmarks/real_scale_learning.py --task shapes --path flagship \
  --slim-stage3 256 --slim-stage5 768 --slim-stage6 1536 --slim-stage4 512 \
  --holdout-n 128 --eval-every 100 --ckpt /tmp/arm_r4_promoted.ckpt --ckpt-every 500 \
  > outputs/arm_r4_promoted.jsonl 2> outputs/arm_r4_promoted.log
python benchmarks/real_scale_learning.py --task shapes --path flagship \
  --slim-stage3 128 --slim-stage5 384 \
  --holdout-n 128 --eval-every 100 --ckpt /tmp/arm_r4_negctl.ckpt --ckpt-every 500 \
  > outputs/arm_r4_negctl.jsonl 2> outputs/arm_r4_negctl.log
echo "chain done $(date -u +%H:%M:%S)" > /tmp/arm_chain.done
