"""Op-level device-time breakdown of the flagship (smoke base) train step.

Captures a jax.profiler trace of the exact bench.py step (UNet3D dim 64,
batch 6, full loss+grad+Adam+EMA), then parses the trace-viewer JSON and
prints the top ops by total device time, grouped by fusion/op name.  This is
the measurement VERDICT r1 asked for ("where does the non-MXU ~80% go") —
readable without TensorBoard.

Run on the chip (pause campaigns first, e.g. via bench.py's pidfile pause):
    python benchmarks/profile_step.py [--steps 5] [--out /tmp/wdno_trace]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

# repo-root import WITHOUT PYTHONPATH: an env PYTHONPATH entry breaks the
# axon TPU plugin's entry-point discovery on this box
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wdno_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_step():
    from wdno_tpu.core.conditioning import smoke_spec
    from wdno_tpu.core.diffusion import GaussianDiffusion
    from wdno_tpu.core.schedules import make_schedule
    from wdno_tpu.data.rescalers import smoke_wavelet_rescaler
    from wdno_tpu.models.unet3d import UNet3D
    from wdno_tpu.train.state import TrainConfig, create_train_state
    from wdno_tpu.train.trainer import make_train_step

    B, F, H, Wd, C = 6, 24, 40, 40, 42
    state_shape = (F, H, Wd, C)
    model = UNet3D(dim=64, dim_mults=(1, 2, 4), channels=C, dtype=jnp.bfloat16)
    x = jnp.zeros((B,) + state_shape, jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
    spec = smoke_spec(state_shape, (18, 34, 34), is_condition_control=True)
    gd = GaussianDiffusion(
        model.apply, make_schedule("sigmoid", 1000), state_shape=state_shape,
        spec=spec, loss_channel_weight=smoke_wavelet_rescaler("bior1.3"),
    )
    cfg = TrainConfig(learning_rate=1e-3, lr_schedule="multistep")
    tstate = create_train_state(params, cfg)
    step = jax.jit(make_train_step(gd, cfg), donate_argnums=(0,))
    batch = jax.random.normal(jax.random.PRNGKey(1), (B,) + state_shape, jnp.float32)
    return step, tstate, batch


def parse_trace(outdir, topk=40):
    """Parse the newest trace-viewer json.gz and aggregate device-op times."""
    files = sorted(
        glob.glob(os.path.join(outdir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    if not files:
        print("no trace files under", outdir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid names like "/device:TPU:0" / "TPU:0"; XLA op events
    # carry dur (us).  Aggregate by event name.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "device" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    wall = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        tot[name] += dur
        cnt[name] += 1
        wall += dur
    print(f"\n== device op totals ({files[-1].split('/')[-1]}; sum {wall / 1e3:.2f} ms) ==")
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    for name, us in rows[:topk]:
        print(f"{us / 1e3:9.3f} ms  x{cnt[name]:<4d} {name[:110]}")
    # coarse class buckets
    def bucket(n):
        n = n.lower()
        if "conv" in n:
            return "conv"
        if "dot" in n or "gemm" in n or "matmul" in n:
            return "matmul"
        if "fusion" in n:
            return "fusion(elementwise/other)"
        if "all" in n and ("reduce" in n or "gather" in n):
            return "collective"
        if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
            return "layout/copy"
        if "custom" in n or "pallas" in n:
            return "pallas/custom"
        return "other"

    btot = defaultdict(float)
    for name, us in tot.items():
        btot[bucket(name)] += us
    print("\n== class buckets ==")
    for b, us in sorted(btot.items(), key=lambda kv: -kv[1]):
        print(f"{us / 1e3:9.3f} ms  {us / wall * 100:5.1f}%  {b}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", type=str, default="/tmp/wdno_trace")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()

    if not args.parse_only:
        from bench import _PauseCampaign  # repo root is on sys.path above

        step, tstate, batch = build_step()
        rngs = list(jax.random.split(jax.random.PRNGKey(0), args.steps + 2))
        jax.block_until_ready(rngs)
        tstate, m = step(tstate, batch, rngs[0])  # compile + warmup
        jax.block_until_ready(m["loss"])
        with _PauseCampaign():
            # one more warm step so the first traced step isn't interleaved
            # with a paused campaign's last in-flight program
            tstate, m = step(tstate, batch, rngs[args.steps + 1])
            jax.block_until_ready(m["loss"])
            t0 = time.time()
            jax.profiler.start_trace(args.out)
            for i in range(args.steps):
                tstate, m = step(tstate, batch, rngs[i + 1])
            jax.block_until_ready(m["loss"])
            jax.profiler.stop_trace()
            dt = (time.time() - t0) / args.steps
        print(f"traced {args.steps} steps, {dt * 1e3:.1f} ms/step ({1 / dt:.2f} steps/s)")
    parse_trace(args.out)


if __name__ == "__main__":
    main()
