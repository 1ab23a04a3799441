#!/usr/bin/env bash
# R5-S1b: the smoke zero-shot SR-chain eval, run FIRST with the checkpoints
# we already have (base_sim_smoke@90k, super_smoke@20k from the committed
# r5 exports) — this is the single reference capability still without a
# quality row (VERDICT r4 missing #1; the prior session trained the super
# model and fixed the level-1 VMEM OOM but was reset before the eval
# landed).  Running it before the datagen/train stages (a) banks the row
# whatever happens later and (b) pays the cold sampler/chain compiles once,
# so the end-of-round re-eval at the final super checkpoint is warm.
# Reduced Ntest=10 vs the protocol's 50 — recorded honestly in RESULTS.md.
. "$(dirname "$0")/../r3_lib.sh"
gate_model base_sim_smoke || exit 1
gate_model super_smoke || exit 1
if [ ! -e data/2d/test_sr.npz ]; then
  wait_for_tpu
  timeout 2700 python -m wdno_tpu.cli datagen-smoke --out data/2d \
      --split test_sr --n 10 --start 250 --record_stride 8 --record_res 128 \
      || exit 1
fi
wait_for_tpu
timeout 5400 python -m wdno_tpu.cli eval-smoke --data data/2d \
    --exp base_sim_smoke --task sim --checkpoint latest --split test_sr \
    --start 0 --ntest 10 --batch_eval 10 --ddim_steps 100 \
    --super_exp super_smoke --super_checkpoint latest --upsample 1 || exit 1
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_smoke --task sim_sr
save_results base_sim_smoke
cp results/base_sim_smoke/eval_results.json \
   artifacts/eval/base_sim_smoke_sr20k_eval_results.json 2>/dev/null || true
commit_artifacts "campaign: smoke SR-chain eval (super@20k, Ntest=10)"
