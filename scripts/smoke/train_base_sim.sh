#!/usr/bin/env bash
# Base simulation model, conditioned on control (reference train_base_sim.sh;
# the reference's 2-GPU DDP maps to the data axis of the device mesh here)
set -e
cd "$(dirname "$0")/../.."
python -m wdno_tpu.cli train-smoke --data data/2d --exp base_sim --condition_control True
