#!/usr/bin/env bash
# R5-S5: train the smoke SUPER model (82-channel refinement, space
# downsample; /root/reference/scripts/smoke/train_super_sim.sh budget is
# 300k steps — this stage takes the remaining window minus 70 min
# reserved for the SR-chain eval, and exports at the boundary).  Trains
# levels 0..1, each conditioned on the next coarser level, on the
# streaming aligned-slab reservoirs (parity pinned by
# tests/test_streaming_loader.py).  2500-scene data budget (see stage 30).
. "$(dirname "$0")/../r3_lib.sh"
SRC=data/2d/coef_bior1.3_zero_space_train.npz
[ -e "$SRC" ] || { echo "[r5] no prepped coef levels; skipping"; exit 0; }
re=$(round_end_epoch)
if [ -n "$re" ]; then
  # 50 min tail is enough for the SR-chain eval: scripts/r5_warm.sh
  # pre-generated test_sr.npz and pre-warmed the sampler/chain compiles,
  # so stage 60 runs in ~15 min instead of ~50.
  DEADLINE_EPOCH=$(( re - 3000 ))
else
  DEADLINE_EPOCH=$(( $(date +%s) + 5400 ))
fi
if [ "$(( DEADLINE_EPOCH - $(date +%s) ))" -lt 1200 ]; then
  echo "[r5] <20 min left for smoke super; skipping"; exit 0
fi
# two reservoirs share HBM/refresh budgets, split ~4:1 by row bytes.
# Refresh sized so the reservoir never freezes inside this run (VERDICT r4
# weak #3): at 2500 scenes level 0 is ~8 GB total, and the 125 GB host
# absorbs the tunnel client's ~95%-of-bytes RSS leak at this budget.
export WDNO_RESERVOIR_GB=${WDNO_RESERVOIR_GB:-6}
export WDNO_REFRESH_GB=${WDNO_REFRESH_GB:-60}
train_to super_smoke train-smoke --ema_only 300000 --data data/2d \
    --super_model True --condition_control True --n_downsample 2
