#!/usr/bin/env bash
# B1: Burgers wavelet prep (data/1d train/test persisted from earlier in the
# round; the coef npz did not) + import the committed base_sim model so the
# SR-chain eval (tail stage) has its base sampler.
# Ref: /root/reference/scripts/burgers/burgers_data.sh:1-16.
. "$(dirname "$0")/../r3_lib.sh"
set -e
ls data/1d | grep -q coef || {
  wait_for_tpu
  python -m wdno_tpu.cli prep-burgers --data data/1d
}
# import/export are pure host work (npz <-> orbax) — pin them to CPU so a
# wedged tunnel can never hang them (observed live: a half-alive tunnel
# blocked this import in futex-wait for 25 min)
[ -d results/base_sim_full ] || \
  WDNO_PLATFORM=cpu python -m wdno_tpu.cli import-ckpt --exp base_sim_full \
      --npz artifacts/base_sim_full.npz --milestone final
