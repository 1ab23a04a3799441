"""End-to-end smoke slice: on-device data gen -> 3D wavelet states ->
conditioned video-diffusion training -> guided sampling -> batched
re-simulation metrics.  --tiny for an integration check."""

import argparse
import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--n_train", type=int, default=512)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--timesteps", type=int, default=250)
    ap.add_argument("--ddim_steps", type=int, default=50)
    ap.add_argument("--task", choices=["sim", "control"], default="control")
    args = ap.parse_args()
    if args.tiny:
        args.n_train, args.n_test, args.steps, args.dim = 64, 4, 300, 16
        args.timesteps, args.ddim_steps = 100, 25

    from wdno_tpu.core.conditioning import smoke_spec
    from wdno_tpu.core.diffusion import GaussianDiffusion
    from wdno_tpu.core.schedules import make_schedule
    from wdno_tpu.data.rescalers import smoke_wavelet_rescaler
    from wdno_tpu.data.smoke_data import build_smoke_coef, build_smoke_states, generate_smoke_batch
    from wdno_tpu.eval.smoke_eval import SmokeEvalConfig, eval_smoke_control, eval_smoke_sim
    from wdno_tpu.models.unet3d import UNet3D
    from wdno_tpu.solvers.smoke.scene import make_scene
    from wdno_tpu.train.state import TrainConfig, create_train_state
    from wdno_tpu.train.trainer import make_train_step

    is_sim = args.task == "sim"
    ds_type = "space" if is_sim else "time"
    scene = make_scene()

    print("1) generating scenes...", flush=True)
    t0 = time.time()
    fields_all = {}
    gen_bs = 32
    for i in range(0, args.n_train + args.n_test, gen_bs):
        b = min(gen_bs, args.n_train + args.n_test - i)
        f = generate_smoke_batch(0, b, scene, start=i)
        for k, v in f.items():
            fields_all.setdefault(k, []).append(v)
        print(f"   {i+b} scenes ({(time.time()-t0)/(i+b):.2f}s/scene)", flush=True)
    fields = {k: np.concatenate(v) for k, v in fields_all.items()}

    print("2) wavelet prep...", flush=True)
    train_fields = {k: v[: args.n_train] for k, v in fields.items()}
    db = build_smoke_coef(train_fields, n_downsample=1, downsample_type=ds_type)
    states, coef_shape, ori_shape = build_smoke_states(db, level=0, downsample_type=ds_type)
    print("   states", states.shape, "coef", coef_shape, flush=True)
    assert np.isfinite(states).all()

    print("3) training...", flush=True)
    C = states.shape[-1]
    model = UNet3D(dim=args.dim, dim_mults=(1, 2, 4), channels=C, dtype=jnp.bfloat16)
    spec = smoke_spec(states.shape[1:], coef_shape, is_condition_control=is_sim)
    sched = make_schedule("sigmoid", args.timesteps)
    gd = GaussianDiffusion(
        model.apply, sched, state_shape=states.shape[1:], spec=spec,
        sampling_timesteps=args.ddim_steps, ddim_eta=1.0,
    )
    x0 = jnp.zeros((args.batch,) + states.shape[1:])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((args.batch,), jnp.int32))
    cfg = TrainConfig(learning_rate=1e-3, lr_schedule="multistep", ema_update_after_step=100)
    tstate = create_train_state(params, cfg)
    step = jax.jit(make_train_step(gd, cfg), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    rs = np.random.default_rng(0)
    on_device = states.nbytes < 4e9
    states_d = jnp.asarray(states) if on_device else states
    t0 = time.time()
    for i in range(args.steps):
        idx = rs.integers(states.shape[0], size=args.batch)
        rng, sub = jax.random.split(rng)
        batch = jnp.take(states_d, jnp.asarray(idx), axis=0) if on_device \
            else jnp.asarray(states[idx])
        tstate, m = step(tstate, batch, sub)
        if i % 100 == 0 or i == args.steps - 1:
            print(f"   step {i} loss {float(m['loss']):.4f} ({(i+1)/(time.time()-t0):.2f} it/s)", flush=True)

    print("4) eval...", flush=True)
    cfg_e = SmokeEvalConfig(
        rescaler=smoke_wavelet_rescaler(), is_condition_control=is_sim,
    )
    # build the test "reference data" stack [B, T, 6, 64, 64]
    tf = {k: v[args.n_train :] for k, v in fields.items()}
    s_ratio = tf["Smoke"][:, :, 1] / tf["Smoke"].sum(-1)
    test_state = np.stack(
        [tf["Density"], tf["Velocity"][..., 0], tf["Velocity"][..., 1],
         tf["Control"][..., 0], tf["Control"][..., 1],
         np.broadcast_to(s_ratio[:, :, None, None], tf["Density"].shape)], axis=2,
    )  # [B, 33, 6, 64, 64]
    if is_sim:
        r = eval_smoke_sim(gd, tstate.ema_params, jax.random.PRNGKey(2), cfg_e,
                           test_state=jnp.asarray(test_state[:, :32]), channels=C)
        print({k: float(np.mean(v)) for k, v in r.items() if k != "pred"}, flush=True)
        ok = np.isfinite(r["mse"]).all()
    else:
        # control: the test data is only used for the initial condition
        big = np.repeat(test_state[:, :32], 8, axis=1)  # fake 256-frame stack
        r = eval_smoke_control(
            gd, tstate.ema_params, jax.random.PRNGKey(2), cfg_e, scene,
            test_state=jnp.asarray(big), channels=C,
            standard_fixed_ratio=100.0, w_init=0.1, chunk=4,
        )
        print({k: float(np.mean(v)) for k, v in r.items() if k not in ("pred", "solver_out")}, flush=True)
        ok = np.isfinite(r["J_total"]).all()
    print("E2E_SMOKE_OK" if ok else "E2E_SMOKE_FAIL", flush=True)


if __name__ == "__main__":
    main()
