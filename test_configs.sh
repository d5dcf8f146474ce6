#!/bin/bash
# Config smoke matrix (reference test_configs.sh:1-11 port): each config must
# boot and train within the timeout on a small subset. The full matrix also
# runs as pytest (tests/test_train_smoke.py) with exit codes checked.
set -x

for ds in MNIST CelebA; do
    for dpm in gc is; do
        for cond in "" "--conditional"; do
            timeout 300s python3 train.py $ds -tss 1000 -ne 1 -dpm $dpm -nms 1 \
                --mean_sample_size 10 $cond -o /tmp/smoke-$ds-$dpm${cond:+-cond} \
                || echo "FAILED: $ds $dpm $cond"
        done
    done
done
