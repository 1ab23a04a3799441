#!/usr/bin/env bash
# Stage 3: smoke workload campaign at the largest budget that fits the
# round — regenerated data (disjoint test stream, cached rollout compile),
# base control training, guided-control eval with on-device re-simulation,
# and the simulation task + spatial SR chain.
set -e
cd "$(dirname "$0")/.."
N_TRAIN=${N_TRAIN:-2048}
STEPS=${STEPS:-40000}
echo "[stage3] datagen train ($N_TRAIN scenes) $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli datagen-smoke --n "$N_TRAIN" --split train --out data/2d
echo "[stage3] datagen control test (256-frame) $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli datagen-smoke --n 50 --split test --record_stride 1 --out data/2d
echo "[stage3] prep $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli prep-smoke --data data/2d --split train
python -m wdno_tpu.cli prep-smoke --data data/2d --split test
echo "[stage3] train base control ($STEPS steps) $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli train-smoke --data data/2d --exp base_control_full \
    --steps "$STEPS" --overwrite
echo "[stage3] eval control (DDIM-100, guided, Ntest=50) $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli eval-smoke --data data/2d --exp base_control_full \
    --task control --ntest 50 --batch_eval 10 --ddim_steps 100 \
    --standard_fixed_ratio 100 --w_init 0.1
echo "[stage3] done $(date -u +%H:%M:%S)"
