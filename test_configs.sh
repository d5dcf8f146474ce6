#!/bin/bash
# Config smoke matrix (reference test_configs.sh:1-11 port): each config must
# boot and train within the timeout on a small subset. The full matrix also
# runs as pytest (tests/test_train_smoke.py) with exit codes checked.
set -x

# 600s: a COLD CelebA compile through the TPU relay can exceed 300s in bad
# relay periods (the persistent compilation cache makes reruns fast); a
# timeout still exits cleanly — the trainer's SIGTERM handler checkpoints
# and exits gracefully (tests/test_preempt.py). In DEGRADED relay periods
# even tiny MNIST configs can stall minutes in dispatch waits (measured:
# 7m52 wall / 12s CPU for a 1-epoch tss=1000 run) — a FAILED marker then
# reflects the link, not the config; the exit-code-checked smoke matrix
# is tests/test_train_smoke.py (CPU).
for ds in MNIST CelebA; do
    for dpm in gc is; do
        for cond in "" "--conditional"; do
            timeout 600s python3 train.py $ds -tss 1000 -ne 1 -dpm $dpm -nms 1 \
                --mean_sample_size 10 $cond -o /tmp/smoke-$ds-$dpm${cond:+-cond} \
                || echo "FAILED: $ds $dpm $cond"
        done
    done
done
