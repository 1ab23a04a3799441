"""Component-level timing breakdown of the flagship (smoke base) train step.

VERDICT r1 asked where the non-MXU ~80% of the step goes.  Rather than
parsing profiler protobufs, this times each architectural component of the
UNet3D at its exact in-model shapes (published config: dim 64, mults
(1,2,4), 42 channels, [24,40,40], batch 6), fwd and fwd+bwd, plus the whole
model and the whole train step — the difference between the component sum
and the whole tells us how much XLA fusion wins/loses.

Run on the chip:  python benchmarks/step_breakdown.py  [--iters 20]
Pause any campaign training first (bench.py does this automatically; here
use scripts/campaign_status.sh or SIGSTOP the pgid by hand).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wdno_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def bench_module(name, mod, xs, extra=(), iters=20, rows=None, flops_hint=None):
    """Time mod.apply fwd and fwd+bwd(sum-loss) at the given input."""
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), *xs, *extra)

    @jax.jit
    def fwd(p, *a):
        return mod.apply(p, *a)

    @jax.jit
    def fwdbwd(p, *a):
        def loss(p):
            return jnp.sum(mod.apply(p, *a) ** 2)

        return jax.grad(loss)(p)

    tf = timeit(fwd, params, *xs, *extra, iters=iters)
    tb = timeit(fwdbwd, params, *xs, *extra, iters=iters)
    rows.append((name, tf * 1e3, tb * 1e3, flops_hint))
    print(f"{name:<44s} fwd {tf * 1e3:8.3f} ms   fwd+bwd {tb * 1e3:8.3f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=6)
    args = ap.parse_args()

    from wdno_tpu.models import layers as L
    from wdno_tpu.models.unet3d import (
        UNet3D,
        _SpatialLinearAttention,
        _TemporalAttention,
        _SpatialFullAttention,
    )

    B, F, H, W, C = args.batch, 24, 40, 40, 42
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(1)
    rows = []

    def rand(shape):
        return jax.random.normal(key, shape, jnp.float32).astype(dt)

    temb = rand((B, 256))
    pos_bias = rand((4, F, F))

    # init conv 7^3 (the single largest FLOP block: 343*42*64 MACs/site)
    bench_module(
        "init_conv 7^3 42->64 @24x40x40",
        L.TemporalDecompConv3d(64, (7, 7, 7), dtype=dt),
        (rand((B, F, H, W, C)),),
        iters=args.iters, rows=rows,
    )

    # resnet blocks at each scale (x2 per scale in model)
    for dim_in, dim_out, h in ((64, 64, 40), (64, 128, 20), (128, 256, 10)):
        bench_module(
            f"resblock {dim_in}->{dim_out} @24x{h}x{h}",
            L.ResnetBlock(dim_out, groups=8, spatial_rank=3, dtype=dt),
            (rand((B, F, h, h, dim_in)),),
            extra=(temb,),
            iters=args.iters, rows=rows,
        )

    # attentions at each scale
    for dim, h in ((64, 40), (128, 20), (256, 10)):
        bench_module(
            f"spatial_linear_attn {dim} @{h}x{h}",
            _SpatialLinearAttention(4, dt),
            (rand((B, F, h, h, dim)),),
            iters=args.iters, rows=rows,
        )
        bench_module(
            f"temporal_attn {dim} @{h}x{h}",
            _TemporalAttention(4, 32, dt),
            (rand((B, F, h, h, dim)),),
            extra=(pos_bias,),
            iters=args.iters, rows=rows,
        )
    bench_module(
        "mid spatial_full_attn 256 @10x10",
        _SpatialFullAttention(4, 32, dt),
        (rand((B, F, 10, 10, 256)),),
        iters=args.iters, rows=rows,
    )

    # resampling convs
    bench_module(
        "downsample (1,4,4)s2 64 @40->20",
        L.TemporalDecompConv3d(64, (1, 4, 4), strides=(1, 2, 2),
                               padding=((0, 0), (1, 1), (1, 1)), dtype=dt),
        (rand((B, F, 40, 40, 64)),),
        iters=args.iters, rows=rows,
    )
    bench_module(
        "upsample convT (1,4,4)s2 128 @10->20",
        L.SpatialConvTranspose3d(128, (1, 4, 4), strides=(1, 2, 2), dtype=dt),
        (rand((B, F, 10, 10, 128)),),
        iters=args.iters, rows=rows,
    )

    # whole model fwd / fwd+bwd
    model = UNet3D(dim=64, dim_mults=(1, 2, 4), channels=C, dtype=dt)
    x = jax.random.normal(key, (B, F, H, W, C), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)

    @jax.jit
    def fwd(p, x, t):
        return model.apply(p, x, t)

    @jax.jit
    def fwdbwd(p, x, t):
        return jax.grad(lambda p: jnp.sum(model.apply(p, x, t) ** 2))(p)

    tf = timeit(fwd, params, x, t, iters=args.iters)
    tb = timeit(fwdbwd, params, x, t, iters=args.iters)
    print(f"{'WHOLE UNet3D':<44s} fwd {tf * 1e3:8.3f} ms   fwd+bwd {tb * 1e3:8.3f} ms")

    # full train step for reference
    from wdno_tpu.core.conditioning import smoke_spec
    from wdno_tpu.core.diffusion import GaussianDiffusion
    from wdno_tpu.core.schedules import make_schedule
    from wdno_tpu.data.rescalers import smoke_wavelet_rescaler
    from wdno_tpu.train.state import TrainConfig, create_train_state
    from wdno_tpu.train.trainer import make_train_step

    spec = smoke_spec((F, H, W, C), (18, 34, 34), is_condition_control=True)
    gd = GaussianDiffusion(
        model.apply, make_schedule("sigmoid", 1000), state_shape=(F, H, W, C),
        spec=spec, loss_channel_weight=smoke_wavelet_rescaler("bior1.3"),
    )
    cfg = TrainConfig(learning_rate=1e-3, lr_schedule="multistep")
    tstate = create_train_state(params, cfg)
    step = jax.jit(make_train_step(gd, cfg))
    batch = jax.random.normal(jax.random.PRNGKey(2), (B, F, H, W, C), jnp.float32)

    def run_step(s, b, r):
        ns, m = step(s, b, r)
        return m["loss"]

    ts = timeit(run_step, tstate, batch, jax.random.PRNGKey(3), iters=args.iters)
    print(f"{'FULL train step':<44s} {'':>16s}        {ts * 1e3:8.3f} ms  ({1.0 / ts:.2f} steps/s)")

    # component sum (x2 for the second resblock per scale, x2 down+up attn)
    comp_fwd = sum(r[1] for r in rows)
    comp_bwd = sum(r[2] for r in rows)
    print(f"\ncomponent sum (single-count)  fwd {comp_fwd:8.3f} ms   fwd+bwd {comp_bwd:8.3f} ms")
    print("(model has 2 resblocks/scale on both paths + skip-concat widths; "
          "use per-row numbers to rank, not to reconstruct the total)")


if __name__ == "__main__":
    main()
