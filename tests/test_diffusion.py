"""Diffusion core tests: schedule golden values, q/p identities, samplers,
conditioning semantics, guidance plumbing."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from wdno_tpu.core import schedules as S
from wdno_tpu.core.conditioning import (
    burgers_wavelet_spec,
    burgers_raw_spec,
    smoke_spec,
)
from wdno_tpu.core.diffusion import GaussianDiffusion, GuidanceConfig


def _torch_cosine_betas(T, s=0.008):
    """Independent oracle in torch (the reference's numerics substrate)."""
    steps = T + 1
    x = torch.linspace(0, T, steps, dtype=torch.float64)
    acp = torch.cos(((x / T) + s) / (1 + s) * torch.pi * 0.5) ** 2
    acp = acp / acp[0]
    betas = 1 - (acp[1:] / acp[:-1])
    return torch.clip(betas, 0, 0.999).numpy()


def test_cosine_schedule_matches_torch_oracle():
    np.testing.assert_allclose(
        S.cosine_beta_schedule(1000), _torch_cosine_betas(1000), rtol=1e-12
    )


def test_linear_schedule_endpoints():
    b = S.linear_beta_schedule(1000)
    assert abs(b[0] - 1e-4) < 1e-12 and abs(b[-1] - 0.02) < 1e-12


def test_sigmoid_schedule_monotone_and_bounded():
    b = S.sigmoid_beta_schedule(1000)
    assert b.shape == (1000,)
    assert (b > 0).all() and (b <= 0.999).all()
    acp = np.cumprod(1 - b)
    assert acp[-1] < 1e-3  # fully noised at T


@pytest.mark.parametrize("objective", ["pred_noise", "pred_x0", "pred_v"])
def test_q_identities(objective):
    sched = S.make_schedule("cosine", 100, objective=objective)
    gd = GaussianDiffusion(lambda p, x, t: x, sched, state_shape=(8, 8, 2), objective=objective)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (4, 8, 8, 2))
    noise = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 2))
    t = jnp.array([0, 10, 50, 99])
    xt = gd.q_sample(x0, t, noise)
    # invert: x0 from (xt, noise); f32 error amplified by 1/sqrt(acp_t) at
    # large t, hence the loose atol
    np.testing.assert_allclose(
        np.asarray(gd.predict_start_from_noise(xt, t, noise)), np.asarray(x0), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(gd.predict_noise_from_start(xt, t, x0)), np.asarray(noise), atol=2e-3
    )
    v = gd.predict_v(x0, t, noise)
    np.testing.assert_allclose(
        np.asarray(gd.predict_start_from_v(xt, t, v)), np.asarray(x0), atol=2e-3
    )


def test_posterior_at_t0_is_x_start():
    sched = S.make_schedule("cosine", 100)
    gd = GaussianDiffusion(lambda p, x, t: x, sched, state_shape=(4, 4, 1))
    x0 = jnp.ones((2, 4, 4, 1))
    xt = 0.3 * jnp.ones((2, 4, 4, 1))
    mean, var, _ = gd.q_posterior(x0, xt, jnp.array([0, 0]))
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x0), atol=1e-5)
    assert float(var.max()) < 1e-6


def test_burgers_wavelet_spec_contract():
    spec = burgers_wavelet_spec(
        (64, 64, 9),
        (41, 60),
        is_condition_u0=True,
        is_condition_uT=True,
        is_condition_f=True,
    )
    c, p = spec.cond_mask, spec.pad_mask
    assert c[:41, :60, 4:8].all() and not c[:, :, 0:4].any()
    assert c[:, :60, 8].all()  # u0 rows 0:32 + uT rows 32:64 cover all rows
    assert p[41:, :, 0].all()
    assert not p[41:, :60, 8].any()  # last channel exempt from ROW pad (cond there)
    assert p[:, 60:, 0].all() and p[:, 60:, 8].all()  # col pad hits every channel
    assert (c * p).max() == 0
    # apply clamps conditioned entries to values and pad to zero
    x = jnp.ones((2, 64, 64, 9))
    vals = 5.0 * jnp.ones((2, 64, 64, 9))
    out = np.asarray(spec.apply(x, vals))
    assert (out[:, :41, :60, 4:8] == 5.0).all()
    assert (out[:, 50, :, 0] == 0.0).all()
    assert (out[:, :41, :60, 0] == 1.0).all()


def test_burgers_raw_spec_contract():
    spec = burgers_raw_spec((128, 128, 2), (81, 120), is_condition_u0=True, is_condition_f=True)
    c = spec.cond_mask
    assert c[0, :120, 0].all() and not c[1:, :, 0].any()
    assert c[:80, :120, 1].all() and not c[80:, :, 1].any()
    assert spec.pad_mask[81:, :, 0].all() and spec.pad_mask[80:, :, 1].all()


def test_smoke_spec_contract():
    spec = smoke_spec((24, 40, 40, 42), (18, 34, 34), is_condition_control=True)
    c, p = spec.cond_mask, spec.pad_mask
    assert c[..., 40].all()  # init channel fully conditioned
    assert c[..., 24:40].all()
    assert not c[..., :24].any() and not c[..., 41].any()
    assert p[18:, :, :, 0].all() and p[18:, :, :, 41].all()
    assert not p[18:, :, :, 40].any()  # init channel exempt
    assert p[:, 34:, :, 0].all() and p[:, :, 34:, 0].all()
    assert not p[:18, 34:, :, 41].any()  # smoke-out channel exempt from spatial pad
    assert (c * p).max() == 0


def _tiny_gd(spec=None, steps=None, T=20):
    sched = S.make_schedule("cosine", T)
    # "model" predicts zero noise -> x_start = xt / sqrt(acp_t)
    model = lambda p, x, t: jnp.zeros_like(x)
    return GaussianDiffusion(
        model, sched, state_shape=(8, 8, 3), spec=spec, sampling_timesteps=steps
    )


def test_ddim_sampler_respects_conditioning():
    spec = burgers_wavelet_spec((8, 8, 3), (6, 6), is_condition_u0=True, is_condition_uT=True)
    gd = _tiny_gd(spec=spec, steps=10)
    cond = 7.0 * jnp.ones((2, 8, 8, 3))
    out = np.asarray(
        gd.ddim_sample(None, jax.random.PRNGKey(0), 2, cond_values=cond)
    )
    assert out.shape == (2, 8, 8, 3)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:, :, :6, 2], 7.0)  # conditioned channel
    np.testing.assert_allclose(out[:, 6:, :, 0], 0.0)  # padded rows
    np.testing.assert_allclose(out[:, :, 6:, :], 0.0)  # padded cols


def test_ddim_trajectory_matches_numpy_oracle():
    """The whole scanned DDIM trajectory against an independent numpy oracle
    (eta=0, deterministic 'model'): verifies the linspace time pairing, the
    clip->guide->rederive order, and the final-step x_start semantics of the
    reference sampler (``diffusion_1d.py:376-460``) as one closed form."""
    T, steps, shape = 20, 5, (4, 4, 2)
    sched = S.make_schedule("cosine", T)
    # deterministic model: eps_hat = 0.3*x + 0.01*t (no params)
    model = lambda p, x, t: 0.3 * x + 0.01 * t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(
        jnp.float32
    )
    gd = GaussianDiffusion(model, sched, state_shape=shape, sampling_timesteps=steps)
    rng = jax.random.PRNGKey(42)
    got = np.asarray(gd.ddim_sample(None, rng, 3, eta=0.0, steps=steps))

    # oracle: same initial noise draw (shared randomness source, independent math)
    _, rng_init = jax.random.split(rng)
    img = np.asarray(jax.random.normal(rng_init, (3,) + shape, jnp.float32), np.float64)
    acp = np.asarray(sched.alphas_cumprod, np.float64)
    times = np.linspace(-1, T - 1, steps + 1).astype(np.int32)[::-1]
    for time, time_next in zip(times[:-1], times[1:]):
        eps = 0.3 * img + 0.01 * time
        x0 = np.clip((img / np.sqrt(acp[time]) - np.sqrt(1 / acp[time] - 1) * eps), -1, 1)
        eps = (img / np.sqrt(acp[time]) - x0) / np.sqrt(1 / acp[time] - 1)  # rederive
        if time_next < 0:
            img = x0
            continue
        a_next = acp[time_next]
        img = x0 * np.sqrt(a_next) + np.sqrt(1 - a_next) * eps
    np.testing.assert_allclose(got, img, rtol=2e-4, atol=2e-5)


def test_ddpm_sampler_runs_and_is_finite():
    gd = _tiny_gd()
    out = np.asarray(gd.p_sample_loop(None, jax.random.PRNGKey(1), 2))
    assert out.shape == (2, 8, 8, 3) and np.isfinite(out).all()
    # zero-noise model with clip -> final x_start bounded
    assert np.abs(out).max() <= 1.0 + 1e-5


def test_guidance_shifts_samples():
    gd = _tiny_gd(steps=10)
    target = 0.5
    guid = GuidanceConfig(
        grad_fn=jax.grad(lambda x: jnp.sum((x - target) ** 2)), weight=0.1
    )
    rng = jax.random.PRNGKey(2)
    base = np.asarray(gd.ddim_sample(None, rng, 4))
    guided = np.asarray(gd.ddim_sample(None, rng, 4, guidance=guid))
    # guidance with +grad of squared distance pushes eps-hat up -> x_start down;
    # just assert it changes the output deterministically and stays finite
    assert np.isfinite(guided).all()
    assert np.abs(guided - base).max() > 1e-4


def test_ddpm_guided_matches_numpy_oracle():
    """Guided ancestral sampling against a numpy oracle: the reference clamps
    x_start AFTER model_predictions (guidance must see the UNclipped x_start,
    ``diffusion_1d.py:242-247``), so this pins both the guidance input and
    the clamp-before-posterior order."""
    T, shape = 8, (4, 4, 2)
    sched = S.make_schedule("cosine", T)
    model = lambda p, x, t: 0.25 * x
    guid = GuidanceConfig(grad_fn=lambda x: 0.1 * x + 0.02, weight=1.0)
    gd = GaussianDiffusion(model, sched, state_shape=shape)
    rng = jax.random.PRNGKey(7)
    got = np.asarray(gd.p_sample_loop(None, rng, 2, guidance=guid))

    # oracle reproducing the same rng stream (same split sequence)
    rng_np = rng
    rng_np, rng_init = jax.random.split(rng_np)
    img = np.asarray(jax.random.normal(rng_init, (2,) + shape, jnp.float32), np.float64)
    acp = np.asarray(sched.alphas_cumprod, np.float64)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    betas = np.asarray(sched.betas, np.float64)
    alphas = 1 - betas
    post_c1 = betas * np.sqrt(acp_prev) / (1 - acp)
    post_c2 = (1 - acp_prev) * np.sqrt(alphas) / (1 - acp)
    post_var = betas * (1 - acp_prev) / (1 - acp)
    post_logvar = np.log(np.maximum(post_var, post_var[1]))
    carry_rng = rng_np
    for t in range(T - 1, -1, -1):
        eps = 0.25 * img + (0.1 * (img / np.sqrt(acp[t]) - np.sqrt(1 / acp[t] - 1) * (0.25 * img)) + 0.02)
        x0 = img / np.sqrt(acp[t]) - np.sqrt(1 / acp[t] - 1) * eps  # unclipped chain
        x0 = np.clip(x0, -1, 1)  # clamp before posterior only
        mean = post_c1[t] * x0 + post_c2[t] * img
        carry_rng, rng_n = jax.random.split(carry_rng)
        noise = np.asarray(jax.random.normal(rng_n, (2,) + shape, jnp.float32), np.float64)
        img = mean + np.exp(0.5 * post_logvar[t]) * noise * (t > 0)
    np.testing.assert_allclose(got, img, rtol=3e-4, atol=3e-5)


def test_p_losses_masks_conditioned_channels():
    spec = burgers_wavelet_spec((8, 8, 3), (6, 6), is_condition_f=False, is_condition_u0=True)
    sched = S.make_schedule("cosine", 50)

    # model that predicts exactly zero: loss = E[(0 - masked_noise)^2]
    gd = GaussianDiffusion(
        lambda p, x, t: jnp.zeros_like(x), sched, state_shape=(8, 8, 3), spec=spec
    )
    rng = jax.random.PRNGKey(3)
    x0 = jax.random.normal(rng, (16, 8, 8, 3))
    t = jnp.zeros((16,), jnp.int32)
    loss = float(gd.p_losses(None, jax.random.PRNGKey(4), x0, t))
    # keep fraction: conditioned u0 region (4 rows x 6 cols of ch2) + pads removed
    keep = spec.keep_mask.mean()
    assert 0 < loss < 1.5 * keep + 0.2


def test_loss_decreases_with_perfect_model():
    """A model that returns the true noise would need the noise; instead check
    pred_x0 objective with identity-ish model gives smaller loss than zero model."""
    sched = S.make_schedule("cosine", 50, objective="pred_x0")
    x0 = jax.random.normal(jax.random.PRNGKey(5), (8, 8, 8, 3))
    t = jnp.full((8,), 5, jnp.int32)

    gd_zero = GaussianDiffusion(
        lambda p, x, t_: jnp.zeros_like(x), sched, state_shape=(8, 8, 3), objective="pred_x0"
    )
    # cheating "perfect" model closure that returns the clean x0
    gd_perfect = GaussianDiffusion(
        lambda p, x, t_: x0, sched, state_shape=(8, 8, 3), objective="pred_x0"
    )
    rngs = jax.random.PRNGKey(6)
    l0 = float(gd_zero.p_losses(None, rngs, x0, t))
    lp = float(gd_perfect.p_losses(None, rngs, x0, t))
    assert lp < 1e-9 < l0


# ---------------------------------------------------------------- eps-proj


def _torch_proj_F(ep, nabla_J):
    """Reference oracle: model_utils.py:75-77 ('F' norm), torch layout
    [B, C, *spatial] with the norm reduced over the trailing spatial dims."""
    spatial = tuple(range(2, ep.ndim))
    norm = ep.square().sum(spatial).sqrt().reshape(ep.shape[:2] + (1,) * len(spatial))
    return ep + nabla_J - (nabla_J * ep).sum() * ep / norm


def test_proj_ep_orthogonal_matches_reference_formula_2d():
    from wdno_tpu.core.diffusion import proj_ep_orthogonal

    rng = np.random.default_rng(0)
    ep = rng.standard_normal((3, 16, 12, 8)).astype(np.float32)  # [B,T,X,C]
    g = rng.standard_normal(ep.shape).astype(np.float32)
    ours = np.asarray(proj_ep_orthogonal(jnp.asarray(ep), jnp.asarray(g)))
    # torch layout: [B,C,T,X]
    ref = _torch_proj_F(
        torch.from_numpy(ep).permute(0, 3, 1, 2),
        torch.from_numpy(g).permute(0, 3, 1, 2),
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_proj_ep_orthogonal_derives_axes_for_smoke_rank():
    """[B,F,H,W,C] states must reduce the norm over ALL spatial axes, not a
    hardcoded (-3,-2) (VERDICT round-1 weak #7)."""
    from wdno_tpu.core.diffusion import proj_ep_orthogonal

    rng = np.random.default_rng(1)
    ep = rng.standard_normal((2, 4, 6, 6, 5)).astype(np.float32)
    g = rng.standard_normal(ep.shape).astype(np.float32)
    ours = np.asarray(proj_ep_orthogonal(jnp.asarray(ep), jnp.asarray(g)))
    ref = _torch_proj_F(
        torch.from_numpy(ep).permute(0, 4, 1, 2, 3),
        torch.from_numpy(g).permute(0, 4, 1, 2, 3),
    ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_guidance_proj_path_changes_prediction():
    """GuidanceConfig.proj routes through proj_ep_orthogonal inside
    model_predictions (reference diffusion_1d.py:221-224 w/ proj_guidance)."""
    from wdno_tpu.core.diffusion import proj_ep_orthogonal

    state_shape = (8, 8, 2)
    sched = S.make_schedule("cosine", 16)
    gd = GaussianDiffusion(
        lambda p, x, t: x * 0.1, sched, state_shape=state_shape, spec=None
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2,) + state_shape)
    t = jnp.array([5, 9], jnp.int32)
    grad_fn = lambda x0: 0.5 * x0
    plain = gd.model_predictions(
        None, x, t, guidance=GuidanceConfig(grad_fn=grad_fn, weight=1.0)
    )
    proj = gd.model_predictions(
        None, x, t,
        guidance=GuidanceConfig(grad_fn=grad_fn, weight=1.0, proj=proj_ep_orthogonal),
    )
    assert np.isfinite(np.asarray(proj.pred_noise)).all()
    assert not np.allclose(np.asarray(plain.pred_noise), np.asarray(proj.pred_noise))
