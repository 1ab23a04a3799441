"""Guided-sampling throughput benchmark (the eval hot loop).

The reference's evaluation wall-clock is dominated by the DDIM sampling
loops with per-step guidance autograd (SURVEY §3 hot loops #2):
Burgers DDIM-50 with iDWT guidance (``eval_ddpm_burgers.py:152-242``) and
smoke DDIM-100 with the design-function gradient (``inference_2d.py:123-152``).
Here both compile to one ``lax.scan``; this prints per-case JSON lines:

    python benchmarks/sampling_bench.py [--cases burgers,smoke] [--iters 3]
"""

import argparse
import json
import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wdno_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_case(name, case, iters):
    # params/cond are explicit jit arguments: captured-constant arrays are
    # inlined into the serialized module, which a remote-compile transport
    # may reject (HTTP 413) and which bloats compile time.
    run, params, cond = case
    sample_fn = lambda rng: run(params, cond, rng)
    t0 = time.time()
    out = sample_fn(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(iters):
        out = sample_fn(jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(json.dumps({
        "case": name, "seconds_per_batch": round(dt, 4),
        "compile_s": round(compile_s, 1),
        "samples_per_sec": round(out.shape[0] / dt, 4),
    }), flush=True)
    return dt


def burgers_case(ddim_steps=50, batch=50, guided=True, dim=128):
    """Base-res Burgers control sampling at the published config:
    UNet2D dim=128 mults (1,2,4,8), 9 channels, 64x64, DDIM-50 eta 1,
    guidance = grad of the iDWT objective (wu=120000)."""
    from wdno_tpu.core.conditioning import burgers_wavelet_spec
    from wdno_tpu.core.diffusion import GaussianDiffusion
    from wdno_tpu.core.schedules import get_J_scheduler, make_schedule
    from wdno_tpu.data.rescalers import burgers_wavelet_rescaler
    from wdno_tpu.eval.burgers_eval import (
        BurgersEvalConfig, make_cond_state, make_control_guidance,
    )
    from wdno_tpu.models.unet2d import UNet2D

    C = 9
    model = UNet2D(dim=dim, dim_mults=(1, 2, 4, 8), channels=C,
                   resnet_block_groups=1, dtype=jnp.bfloat16)
    x0 = jnp.zeros((batch, 64, 64, C))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((batch,), jnp.int32))
    spec = burgers_wavelet_spec((64, 64, C), (41, 60),
                                is_condition_u0=True, is_condition_uT=True)
    gd = GaussianDiffusion(
        model.apply, make_schedule("cosine", 1000), state_shape=(64, 64, C),
        spec=spec, sampling_timesteps=ddim_steps, ddim_eta=1.0,
    )
    ecfg = BurgersEvalConfig(rescaler=burgers_wavelet_rescaler(),
                             is_condition_uT=True)
    u_target = jnp.asarray(np.random.default_rng(0).standard_normal((batch, 81, 120)), jnp.float32)
    guidance = (
        make_control_guidance(ecfg, u_target, wu=120000.0, wf=2e-5,
                              J_schedule=get_J_scheduler("cosine", 1000))
        if guided else None
    )
    cond = make_cond_state(ecfg, batch, C, u0=u_target[:, 0], uT=u_target[:, -1])

    @jax.jit
    def run(params, cond, rng):
        return gd.sample(params, rng, batch, cond_values=cond, guidance=guidance)

    return run, params, cond


def smoke_case(ddim_steps=100, batch=10, guided=True, dim=64):
    """Base smoke control sampling at the published config: UNet3D dim=64
    mults (1,2,4), 42 channels over [24,40,40], DDIM-100 eta 1, guidance =
    design-fn gradient through waverec3 (standard_fixed_ratio=100)."""
    from wdno_tpu.core.conditioning import smoke_spec
    from wdno_tpu.core.diffusion import GaussianDiffusion
    from wdno_tpu.core.schedules import make_schedule
    from wdno_tpu.data.rescalers import smoke_wavelet_rescaler
    from wdno_tpu.eval.smoke_eval import SmokeEvalConfig, make_smoke_guidance
    from wdno_tpu.models.unet3d import UNet3D

    C = 42
    state_shape = (24, 40, 40, C)
    model = UNet3D(dim=dim, dim_mults=(1, 2, 4), channels=C, dtype=jnp.bfloat16)
    x0 = jnp.zeros((batch,) + state_shape)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((batch,), jnp.int32))
    spec = smoke_spec(state_shape, (18, 34, 34), is_condition_control=False)
    gd = GaussianDiffusion(
        model.apply, make_schedule("sigmoid", 1000), state_shape=state_shape,
        spec=spec, sampling_timesteps=ddim_steps, ddim_eta=1.0,
    )
    ecfg = SmokeEvalConfig(rescaler=smoke_wavelet_rescaler())
    d0 = jnp.asarray(np.random.default_rng(0).random((batch, 64, 64)), jnp.float32)
    guidance = (
        make_smoke_guidance(ecfg, init_u=d0, standard_fixed_ratio=100.0, w_init=0.1)
        if guided else None
    )

    from wdno_tpu.eval.smoke_eval import make_smoke_cond_state

    cond = make_smoke_cond_state(ecfg, C, d0=d0)

    @jax.jit
    def run(params, cond, rng):
        return gd.sample(params, rng, batch, cond_values=cond, guidance=guidance)

    return run, params, cond


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=str, default="burgers,smoke")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--unguided", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke-test sizes")
    args = ap.parse_args()
    for case in args.cases.split(","):
        if case == "burgers":
            fn = burgers_case(guided=not args.unguided,
                              **({"dim": 8, "batch": 2, "ddim_steps": 4} if args.tiny else {}))
        elif case == "smoke":
            fn = smoke_case(guided=not args.unguided,
                            **({"dim": 8, "batch": 2, "ddim_steps": 4} if args.tiny else {}))
        else:
            raise SystemExit(f"unknown case {case}")
        bench_case(case + ("" if args.unguided else "+guidance"), fn, args.iters)


if __name__ == "__main__":
    main()
