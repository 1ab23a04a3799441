#!/usr/bin/env bash
# R5 compile pre-warm (r4_warm_sim.sh pattern, extended to the super
# family): AOT compiles go through the chipless remote helper, so warming
# while stages 30/40 own the chip means stage 50 (super train) and stage
# 60 (SR-chain eval) start stepping immediately instead of idling the
# training window through ~15-25 min cold compiles.
#
# 1. synthetic 64-scene train split -> CPU prep -> /tmp/warmdata coef blob
#    (shapes identical to the real 2500-scene prep; contents irrelevant)
# 2. REAL test_sr split straight into data/2d (content = pure (seed,index)
#    functions, so generating it early == stage 60 generating it)
# 3. 1-step super train on the synthetic blob -> warms the 82-ch train step
# 4. SR-chain eval (real base model + warm super) into /tmp/warmres ->
#    warms the base sampler + super chain at exactly stage-60 shapes, and
#    end-to-end exercises the --super_checkpoint latest resolution fix
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/wdno_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0
set -x

mkdir -p /tmp/warmdata /tmp/warmres
if [ ! -e /tmp/warmdata/coef_bior1.3_zero_space_train.npz ]; then
  nice -n 10 env JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu python - <<'EOF'
import numpy as np
rng = np.random.default_rng(0)
N, F, R = 64, 33, 64
np.savez("/tmp/warmdata/train.npz",
         Density=rng.random((N, F, R, R), np.float32) * 0.1,
         Velocity=rng.standard_normal((N, F, R, R, 2)).astype(np.float32) * 0.1,
         Control=rng.standard_normal((N, F, R, R, 2)).astype(np.float32) * 0.1,
         Smoke=rng.random((N, F, 8), np.float32) + 0.1)
EOF
  nice -n 10 env JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu \
    python -m wdno_tpu.cli prep-smoke --data /tmp/warmdata --split train \
      --types space --n_downsample 3
fi

if [ ! -e data/2d/test_sr.npz ]; then
  timeout 2700 python -m wdno_tpu.cli datagen-smoke --out data/2d \
      --split test_sr --n 10 --start 250 --record_stride 8 --record_res 128
fi

if [ ! -d results/warm_super ]; then
  WDNO_RESERVOIR_GB=0.5 WDNO_REFRESH_GB=1 timeout 2700 \
    python -m wdno_tpu.cli train-smoke --data /tmp/warmdata \
      --exp warm_super --super_model True --condition_control True \
      --n_downsample 2 --steps 1 --ckpt_every 0 --overwrite
fi

if [ ! -e /tmp/warmres/done ]; then
  cp -r results/base_sim_smoke results/warm_super /tmp/warmres/ 2>/dev/null || true
  timeout 3600 python -m wdno_tpu.cli eval-smoke --data data/2d \
      --results /tmp/warmres --exp base_sim_smoke --task sim \
      --checkpoint latest --split test_sr --start 0 --ntest 10 \
      --batch_eval 10 --ddim_steps 100 \
      --super_exp warm_super --super_checkpoint latest --upsample 1 \
    && touch /tmp/warmres/done
fi
echo "r5 warm done $(date -u +%H:%M:%S)"
