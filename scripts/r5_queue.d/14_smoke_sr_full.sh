#!/usr/bin/env bash
# R5-S2d: extend the smoke SR-chain eval from Ntest=10 to the protocol's
# FULL Ntest=50 (/root/reference/smoke/scripts? inf_super_sim.sh scores the
# 50-scene test stream).  Scene identity is a pure (seed, index) function,
# so regenerating test_sr with 50 scenes keeps scenes 250-259 bit-identical
# and the stage-07 chunk [0,10) stays valid; the 4 remaining chunks reuse
# the warm sampler/chain compiles from stage 07.
. "$(dirname "$0")/../r3_lib.sh"
gate_model base_sim_smoke || exit 0
gate_model super_smoke || exit 0
re=$(round_end_epoch)
NS=$(python - <<'EOF'
import numpy as np
try:
    print(np.load("data/2d/test_sr.npz")["Density"].shape[0])
except Exception:
    print(0)
EOF
)
if [ "$NS" -lt 50 ]; then
  if [ -n "$re" ] && [ "$(( re - $(date +%s) ))" -lt 2100 ]; then
    echo "[r5] <35 min left; keeping Ntest=10 SR row"; exit 0
  fi
  wait_for_tpu
  timeout 2700 python -m wdno_tpu.cli datagen-smoke --out data/2d \
      --split test_sr --n 50 --start 250 --record_stride 8 --record_res 128 \
      || exit 1
fi
for s in 10 20 30 40; do
  [ -e "results/base_sim_smoke/eval_raw_sim_sr_${s}.npz" ] && continue
  if [ -n "$re" ] && [ "$(( re - $(date +%s) ))" -lt 1200 ]; then
    echo "[r5] SR-full eval cut before chunk $s (round-end window)"; break
  fi
  wait_for_tpu
  timeout 3600 python -m wdno_tpu.cli eval-smoke --data data/2d \
      --exp base_sim_smoke --task sim --checkpoint latest --split test_sr \
      --start "$s" --ntest 10 --batch_eval 10 --ddim_steps 100 \
      --super_exp super_smoke --super_checkpoint latest --upsample 1 || true
done
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_smoke --task sim_sr
save_results base_sim_smoke
cp results/base_sim_smoke/eval_results.json \
   artifacts/eval/base_sim_smoke_sr20k_eval_results.json 2>/dev/null || true
commit_artifacts "campaign: smoke SR-chain eval extended toward protocol Ntest=50"
