#!/usr/bin/env bash
# Tiny-scale preflight of every campaign_r3 stage on the real chip, using
# the same CLI commands and (for training) the same compiled shapes as the
# campaign, so the campaign starts with a warm compile cache and a proven
# path.  ~30 min, mostly compiles.
set -e
cd "$(dirname "$0")/.."
D=data/2d_preflight
echo "[pf] datagen train (8 scenes) $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli datagen-smoke --n 8 --batch 8 --split train --out $D
echo "[pf] datagen test (2 scenes, stride 1) $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli datagen-smoke --n 2 --batch 2 --split test --record_stride 1 --out $D
echo "[pf] prep $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli prep-smoke --data $D --split train
python -m wdno_tpu.cli prep-smoke --data $D --split test
echo "[pf] train 30 steps at the campaign config (dim 64, batch 6) $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli train-smoke --data $D --exp preflight_smoke \
    --steps 30 --ckpt_every 25 --log_every 5 --overwrite
echo "[pf] export + reimport $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli export-ckpt --exp preflight_smoke --ema_only \
    --out /tmp/preflight_smoke.npz
python -m wdno_tpu.cli import-ckpt --exp preflight_smoke_imported \
    --npz /tmp/preflight_smoke.npz
echo "[pf] guided control eval (2 scenes, DDIM-10) $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli eval-smoke --data $D --exp preflight_smoke \
    --task control --checkpoint latest --ntest 2 --batch_eval 2 \
    --ddim_steps 10 --standard_fixed_ratio 100 --w_init 0.1
python -m wdno_tpu.cli aggregate-eval --results results --exp preflight_smoke --task control
echo "[pf] ALL STAGES OK $(date -u +%H:%M:%S)"
