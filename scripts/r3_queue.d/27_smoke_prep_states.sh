#!/usr/bin/env bash
# S3c: build the training states caches on the HOST CPU.  In round 3 the
# training stage itself built these with jnp ops on the tunneled TPU —
# streaming ~33 GB of chunks through the tunnel ate the entire 1-hour
# training window before step 1 (logs/campaign_r3.log, 05:49-06:50).  The
# build is trivial pad/concat/divide work (reference data_2d.py:156-221);
# under JAX_PLATFORMS=cpu it never touches the tunnel and frees the chip
# for whatever stage runs next.  Needs no TPU: safe to run concurrently
# with a chip-bound stage.
. "$(dirname "$0")/../r3_lib.sh"
set -e
# base CONTROL model (guidance target): unconditioned, "time" downsample
# (reference train_2d.py: is_condition_control=False for the control model)
JAX_PLATFORMS=cpu python -m wdno_tpu.cli train-smoke --states_only \
    --data data/2d
# base SIM model: conditioned on control, "space" downsample
# (reference train_2d.py:60)
JAX_PLATFORMS=cpu python -m wdno_tpu.cli train-smoke --states_only \
    --data data/2d --condition_control True
ls -la data/2d/states_*.npy
