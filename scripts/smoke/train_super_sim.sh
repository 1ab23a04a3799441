#!/usr/bin/env bash
# Spatial super-resolution refinement model (reference train_super_sim.sh)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli train-smoke --data data/2d --exp super_sim \
    --condition_control True --super_model True --n_downsample 2 --steps 300000
