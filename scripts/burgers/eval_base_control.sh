#!/usr/bin/env bash
# Control eval: wu=120000, wf=2e-5, cosine J-scheduler (reference eval_base_control.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli eval-burgers --data data/1d --exp base_control --task control \
    --ntest 200 --batch_eval 25 --ddim_steps 50 --ddim_eta 1 \
    --wu 120000 --wf 0.00002 --J_scheduler cosine
