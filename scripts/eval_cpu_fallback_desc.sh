#!/usr/bin/env bash
# Second-phase CPU fallback for the reference-protocol base-sim eval
# (Ntest=8000, DDIM-50): after scripts/eval_cpu_fallback.sh has finished
# its reserved [7000, 8000) range, keep the eval progressing while the TPU
# tunnel is down by working DESCENDING from 6950 in 50-sample chunks.  The
# TPU chunk loop (scripts/eval_base_sim_chunked.sh) works ascending from 0
# in 1000-sample blocks, so the two producers converge toward each other.
#
# Block reservation: on entering a 1000-aligned block the CPU drops an
# empty placeholder npz at the block start, which the TPU loop's existence
# check treats as done — so the chip never duplicates a block the CPU is
# filling.  A chunk is skipped when its own file is non-empty or when the
# block-start file already covers its offset (i.e. a real 1000-sample TPU
# chunk).  Any race that still double-produces samples is deduplicated
# exactly by `aggregate-eval` (first-starting chunk wins).
cd "$(dirname "$0")/.."
CHUNK=${CHUNK:-50}
TOP=${TOP:-6950}
OUT=results/base_sim_full

# wait for the first-phase fallback to release the core
while kill -0 "$(cat /tmp/eval_cpu.pid 2>/dev/null)" 2>/dev/null; do
  echo "[cpu-desc] waiting on /tmp/eval_cpu.pid $(date -u +%H:%M:%S)"; sleep 300
done

covered() {  # covered START -> exit 0 if sample range [START, START+CHUNK) is done
  python - "$1" "$CHUNK" "$OUT" <<'EOF'
import sys, os
import numpy as np
s, chunk, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
def length(path):
    if not os.path.exists(path):
        return 0
    with np.load(path) as z:
        return len(z[z.files[0]]) if z.files else 0
own = length(os.path.join(out, f"eval_raw_sim_{s}.npz"))
block = s // 1000 * 1000
blk = length(os.path.join(out, f"eval_raw_sim_{block}.npz")) if block != s else 0
sys.exit(0 if own >= chunk or blk >= (s - block) + chunk else 1)
EOF
}

tpu_will_cover() {  # tunnel up AND the chip eval loop still alive?
  kill -0 "$(cat /tmp/eval_chunks.pid 2>/dev/null)" 2>/dev/null \
    && timeout 90 python -c "import jax; jax.devices()[0]" 2>/dev/null
}

for ((s = TOP; s >= 0; s -= CHUNK)); do
  if covered "$s"; then
    echo "[cpu-desc chunk $s] already covered, skipping"
    continue
  fi
  block=$((s / 1000 * 1000))
  if [ "$block" -ne "$s" ] && [ ! -e "$OUT/eval_raw_sim_${block}.npz" ]; then
    # About to claim a NEW block.  A reserved block is invisible to the TPU
    # loop's existence check, so the CPU is committed to its ~8h sweep — if
    # the tunnel is back and the chip eval is alive, stop here instead and
    # let the chip (50x faster) cover everything below.  Blocks already
    # reserved stay ours: the chip loop has possibly passed them by now.
    if tpu_will_cover; then
      echo "[cpu-desc] TPU is back; leaving remaining blocks to the chip $(date -u +%H:%M:%S)"
      break
    fi
    python -c "
import numpy as np
np.savez('$OUT/eval_raw_sim_${block}.npz')"  # reserve the block from the TPU loop
    echo "[cpu-desc] reserved block $block"
  fi
  echo "[cpu-desc chunk $s] $(date -u +%H:%M:%S)"
  WDNO_PLATFORM=cpu nice -n 10 timeout 7200 python -m wdno_tpu.cli \
      eval-burgers --data data/1d --exp base_sim_full --task sim \
      --start "$s" --ntest "$CHUNK" --batch_eval 25 \
      --ddim_steps 50 --ddim_eta 1 || echo "[cpu-desc chunk $s] FAILED"
done
echo "[cpu-desc] swept to 0 $(date -u +%H:%M:%S)"
python -m wdno_tpu.cli aggregate-eval --results results --exp base_sim_full \
    --task sim --expect_ntest 8000 || true
