"""End-to-end Burgers slice at configurable scale.

data gen (JAX FD solver) -> wavelet coef dataset -> conditioned diffusion
training -> DDIM sampling conditioned on (u0, f) -> iDWT -> solver-checked
MSE.  This is SURVEY §7's minimum slice; run with --tiny for a fast
integration check, full flags reproduce the reference protocol.
"""

import argparse
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--n_train", type=int, default=2048)
    ap.add_argument("--n_test", type=int, default=32)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--timesteps", type=int, default=250)
    ap.add_argument("--ddim_steps", type=int, default=50)
    ap.add_argument("--super_factor", type=int, default=4)
    ap.add_argument("--out", type=str, default="/tmp/wdno_e2e")
    args = ap.parse_args()
    if args.tiny:
        args.n_train, args.n_test, args.steps, args.dim = 512, 16, 600, 16
        args.timesteps, args.ddim_steps, args.super_factor = 100, 25, 2

    from wdno_tpu.core.conditioning import burgers_wavelet_spec
    from wdno_tpu.core.diffusion import GaussianDiffusion
    from wdno_tpu.core.schedules import make_schedule
    from wdno_tpu.data.burgers_data import (
        build_coef_levels,
        build_training_states,
        generate_burgers_dataset,
    )
    from wdno_tpu.data.rescalers import burgers_wavelet_rescaler
    from wdno_tpu.eval.burgers_eval import BurgersEvalConfig, eval_sim_batch
    from wdno_tpu.models.unet2d import UNet2D
    from wdno_tpu.train.state import TrainConfig, create_train_state
    from wdno_tpu.train.trainer import make_train_step

    print("1) generating data...", flush=True)
    data = generate_burgers_dataset(
        0, args.n_train + args.n_test, super_factor=args.super_factor
    )
    u, f = data["u"], data["f"]
    print("   u", u.shape, "f", f.shape, "finite", np.isfinite(u).all(), flush=True)

    print("2) wavelet prep...", flush=True)
    db = build_coef_levels(u[: args.n_train], f[: args.n_train], n_downsample=1)
    states, coef_shape, ori_shape = build_training_states(
        db, is_condition_u0=True, is_condition_uT=False
    )
    print("   states", states.shape, "coef", coef_shape, "ori", ori_shape, flush=True)
    assert np.isfinite(states).all()
    assert np.abs(states).max() <= 3.0, np.abs(states).max()

    print("3) training...", flush=True)
    C = states.shape[-1]
    model = UNet2D(
        dim=args.dim, dim_mults=(1, 2, 4, 8), channels=C, resnet_block_groups=1,
        dtype=jnp.bfloat16,
    )
    spec = burgers_wavelet_spec(
        (64, 64, C), tuple(coef_shape),
        is_condition_u0=True, is_condition_f=True,
    )
    rescaler = burgers_wavelet_rescaler()
    sched = make_schedule("cosine", args.timesteps)
    gd = GaussianDiffusion(
        model.apply, sched, state_shape=(64, 64, C), spec=spec,
        loss_channel_weight=rescaler,
        sampling_timesteps=args.ddim_steps, ddim_eta=1.0,
    )
    x0 = jnp.zeros((args.batch, 64, 64, C))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((args.batch,), jnp.int32))
    cfg = TrainConfig(learning_rate=1e-4, lr_schedule="cosine",
                      cosine_t_max=10000, ema_update_after_step=100)
    tstate = create_train_state(params, cfg)
    step = jax.jit(make_train_step(gd, cfg), donate_argnums=(0,))

    rng = jax.random.PRNGKey(1)
    rs = np.random.default_rng(0)
    # keep the dataset device-resident when it fits: indexing on device beats
    # shipping a fresh batch over the (possibly slow) host link every step
    on_device = states.nbytes < 4e9
    states_d = jnp.asarray(states) if on_device else states
    import time
    t0 = time.time()
    for i in range(args.steps):
        idx = rs.integers(states.shape[0], size=args.batch)
        rng, sub = jax.random.split(rng)
        batch = jnp.take(states_d, jnp.asarray(idx), axis=0) if on_device \
            else jnp.asarray(states[idx])
        tstate, m = step(tstate, batch, sub)
        if i % 200 == 0 or i == args.steps - 1:
            print(f"   step {i} loss {float(m['loss']):.4f} ({(i+1)/(time.time()-t0):.2f} it/s)", flush=True)

    print("4) sampling + solver check...", flush=True)
    ecfg = BurgersEvalConfig(
        rescaler=rescaler, coef_shape=tuple(coef_shape), ori_shape=tuple(ori_shape),
        is_condition_u0=True, is_condition_f=True,
    )
    u_test = jnp.asarray(u[args.n_train :])
    f_test = jnp.asarray(f[args.n_train :])
    res = eval_sim_batch(
        gd, tstate.ema_params, jax.random.PRNGKey(2), ecfg,
        u_target=u_test, f_raw=f_test, channels=C,
    )
    mse = res["ddpm_mse"].mean()
    base = float(np.square(u[args.n_train:][:, 1:]).mean())  # predict-zero baseline
    print(f"   ddpm_mse={mse:.5f}  (var of u = {base:.5f})", flush=True)
    print("E2E_OK" if np.isfinite(mse) and mse < base else "E2E_WEAK", mse, flush=True)


if __name__ == "__main__":
    main()
