#!/bin/bash
# r5 seed-2 replicates of the two headline arms (flagship untrimmed, compat).
# Purpose: a third seed for the r4 cross-implementation learning-parity claim
# (BASELINE.md r4 "Real-scale RE-gating" — early-learning gap compat vs
# TPU-native at step 500, endpoint parity at 2000). Same knobs as arm_chain_r4.
cd /root/repo
python benchmarks/real_scale_learning.py --task shapes --path flagship --seed 2 \
  --holdout-n 128 --eval-every 100 --ckpt /tmp/arm_r5_flagship_seed2.ckpt --ckpt-every 500 \
  > outputs/arm_r5_flagship_seed2.jsonl 2> outputs/arm_r5_flagship_seed2.log
python benchmarks/real_scale_learning.py --task shapes --path compat --seed 2 \
  --holdout-n 128 --eval-every 100 --ckpt /tmp/arm_r5_compat_seed2.ckpt --ckpt-every 500 \
  > outputs/arm_r5_compat_seed2.jsonl 2> outputs/arm_r5_compat_seed2.log
echo "chain done $(date -u +%H:%M:%S)" > /tmp/arm_chain_r5.done
