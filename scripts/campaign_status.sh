#!/usr/bin/env bash
# One-glance status of the full-budget campaign: runner liveness, TPU
# tunnel state, eval chunk coverage, and training checkpoints.
cd "$(dirname "$0")/.."

echo "== runners =="
for f in /tmp/eval_chunks.pid /tmp/eval_cpu.pid /tmp/eval_cpu_desc.pid \
         /tmp/stage2b.pid /tmp/stage3b.pid /tmp/stage_h_runner.pid; do
  pid=$(cat "$f" 2>/dev/null)
  state=dead
  kill -0 "$pid" 2>/dev/null && state=alive
  # setsid wrappers can shift the recorded pid by a couple
  if [ "$state" = dead ] && [ -n "$pid" ]; then
    for d in 1 2; do
      kill -0 $((pid + d)) 2>/dev/null && { state="alive($((pid + d)))"; break; }
    done
  fi
  printf '%-28s %-8s %s\n' "$(basename "$f")" "$pid" "$state"
done

echo "== tpu tunnel =="
if timeout 90 python -c "import jax; jax.devices()[0]" 2>/dev/null; then
  echo up
else
  echo "down (last probes:)"
  grep "TPU unavailable" /tmp/eval_chunks.log 2>/dev/null | tail -1
fi

echo "== base_sim_full eval coverage =="
python - <<'EOF'
import glob
import numpy as np
cov = set()
for p in glob.glob("results/base_sim_full/eval_raw_sim_[0-9]*.npz"):
    s = int(p.rsplit("_", 1)[1][:-4])
    with np.load(p) as z:
        n = len(z[z.files[0]]) if z.files else 0
    cov.update(range(s, s + n))
print(f"{len(cov)}/8000 samples done")
if cov:
    missing = sorted(set(range(8000)) - cov)
    runs, s0, prev = [], None, None
    for m in missing:
        if s0 is None:
            s0 = prev = m
        elif m == prev + 1:
            prev = m
        else:
            runs.append((s0, prev + 1)); s0 = prev = m
    if s0 is not None:
        runs.append((s0, prev + 1))
    print("missing ranges:", runs[:10])
EOF

echo "== checkpoints =="
for exp in base_sim_full super_full smoke_2048; do
  d="results/$exp"
  [ -d "$d" ] || continue
  ms=$(ls -d "$d"/model-* 2>/dev/null | sed 's/.*model-//' | tr '\n' ' ')
  echo "$exp: $ms"
done
