#!/usr/bin/env bash
# Pre-warm the sim-task compile cache while the control model still trains:
# AOT compiles go through the chipless remote helper, so warming now means
# the chip never idles through a ~13-min compile when stages 40/50 start.
# Uses a throwaway 1-step experiment (same config as base_sim_smoke ->
# identical HLO for both its train step and its eval sampler).
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/wdno_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0
# wait for the control-eval warm run to finish (shares host CPU)
while [ -e /proc/"$(cat /tmp/warm.pid 2>/dev/null || echo 0)" ]; do sleep 30; done
export WDNO_REFRESH_GB=1
nice -n 10 timeout 2400 python -m wdno_tpu.cli train-smoke --data data/2d \
    --exp warm_sim --condition_control True --steps 1 \
    --max_train_samples 64 --ckpt_every 0 --overwrite \
    > /tmp/warm_sim_train.log 2>&1
nice -n 10 timeout 2400 python -m wdno_tpu.cli eval-smoke --data data/2d \
    --exp warm_sim --task sim --checkpoint final --start 0 --ntest 10 \
    --batch_eval 10 --ddim_steps 100 \
    > /tmp/warm_sim_eval.log 2>&1
rm -rf results/warm_sim
echo "warm_sim done $(date -u +%H:%M:%S)"
