"""Zero-shot super-resolution chain integration tests (tiny shapes).

Exercises the reference's refinement-chain protocol (eval_ddpm_burgers.py:
305-338, inference_2d.py:155-232): base-level coefficients are upsampled
into the low-res condition block, the (fully convolutional) super model is
re-bound to the doubled shape, sampled, and decoded.  Checks shapes, finite
outputs, and that hard conditions survive sampling.
"""


import numpy as np
import jax
import jax.numpy as jnp
import pytest

# heavy integration surface: excluded from the fast gate
# (`pytest -m 'not slow'`, ~3 min); the campaign/nightly run covers it
pytestmark = pytest.mark.slow

from wdno_tpu.core.conditioning import burgers_wavelet_spec
from wdno_tpu.core.diffusion import GaussianDiffusion
from wdno_tpu.core.schedules import make_schedule
from wdno_tpu.eval.burgers_eval import BurgersEvalConfig, super_res_chain
from wdno_tpu.eval.smoke_eval import SmokeEvalConfig, smoke_super_res_chain
from wdno_tpu.models.unet2d import UNet2D
from wdno_tpu.models.unet3d import UNet3D
from wdno_tpu.ops import packing as P
from wdno_tpu.ops import wavelet as W


def test_gd_with_shape_rebinds():
    sched = make_schedule("cosine", 8)
    gd = GaussianDiffusion(lambda p, x, t: x, sched, state_shape=(8, 8, 4))
    spec = burgers_wavelet_spec((16, 16, 4), (9, 8))
    gd2 = gd.with_shape((16, 16, 4), spec)
    assert gd2.state_shape == (16, 16, 4)
    assert gd2.spec is spec
    assert gd.state_shape == (8, 8, 4)  # original untouched


def test_burgers_super_res_chain_tiny():
    C = 17  # 8 bands + 8 low bands + 1 condition channel
    rng0 = np.random.default_rng(0)
    B, ot0, ox0 = 2, 9, 8  # base resolution
    ot1, ox1 = 17, 16  # one doubling

    cfg = BurgersEvalConfig(
        rescaler=np.ones(C, np.float32),
        coef_shape=(5, 4),
        ori_shape=(ot0, ox0),
        pad=8,
        is_condition_u0=True,
        is_condition_f=True,
    )
    model = UNet2D(dim=8, dim_mults=(1, 2), channels=C, resnet_block_groups=1)
    x0 = jnp.zeros((B, 8, 8, C))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32))
    sched = make_schedule("cosine", 8)
    gd_super = GaussianDiffusion(
        model.apply, sched, state_shape=(8, 8, C),
        spec=None, sampling_timesteps=4, ddim_eta=0.0,
    )

    # pretend base sample: DWT of a random (u, f) at base resolution
    u = rng0.standard_normal((B, ot0, ox0)).astype(np.float32)
    f = rng0.standard_normal((B, ot0 - 1, ox0)).astype(np.float32)
    f_ext = np.concatenate([f, np.zeros((B, 1, ox0), np.float32)], 1)
    packed = P.pack2d(*W.dwt2d(jnp.asarray(np.stack([u, f_ext], 1)), cfg.wave_type, cfg.pad_mode))
    coef = packed.transpose(0, 2, 3, 1, 4).reshape(B, 5, 4, 8)

    u_hi = jnp.asarray(rng0.standard_normal((B, ot1, ox1)).astype(np.float32))
    f_hi = jnp.asarray(rng0.standard_normal((B, ot1 - 1, ox1)).astype(np.float32))

    out = super_res_chain(
        gd_super, params, jax.random.PRNGKey(1), cfg, coef,
        levels=[((9, 8), (ot1, ox1))],
        u_target=u_hi,
        f_raw_per_level=[f_hi],
        channels=C,
    )
    assert len(out) == 1
    r = out[0]
    assert r["u"].shape == (B, ot1, ox1)
    assert r["f"].shape == (B, ot1 - 1, ox1)
    assert np.isfinite(r["u"]).all() and np.isfinite(r["ddpm_mse"]).all()
    # interpolation-baseline variants (reference eval_ddpm_burgers.py:207-218):
    # here the level output is already at the target grid, so resize is
    # identity and all three MSE variants must agree
    for nm in ("linear", "nearest"):
        assert r[f"ddpm_mse_{nm}_sr"].shape == r["ddpm_mse"].shape
        np.testing.assert_allclose(
            r[f"ddpm_mse_{nm}_sr"],
            np.asarray(
                ((r["u"][:, 1:] - np.asarray(u_hi)[:, 1:]) ** 2).mean(axis=(1, 2))
            ),
            rtol=1e-5,
        )


@pytest.mark.slow
def test_smoke_super_res_chain_tiny():
    C = 82
    B, ot, oh = 1, 8, 16
    ft, fh = 6, 10  # bior1.3 zero-mode coef dims of (8, 16, 16)
    rng0 = np.random.default_rng(1)

    cfg = SmokeEvalConfig(
        rescaler=np.ones(C, np.float32),
        coef_shape=(ft, fh, fh),
        ori_shape=(ot, oh, oh),
        pad_t=8,
        pad_x=12,
        is_condition_control=True,
    )
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=C, resnet_groups=2, init_kernel_size=3)
    x0 = jnp.zeros((B, 8, 12, 12, C))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32))
    sched = make_schedule("sigmoid", 8)
    gd_super = GaussianDiffusion(
        model.apply, sched, state_shape=(8, 12, 12, C),
        spec=None, sampling_timesteps=4, ddim_eta=0.0,
    )

    # pretend base-level bands from a random 5-field video
    X = rng0.standard_normal((B, 5, ot, oh, oh)).astype(np.float32)
    packed = P.pack3d(*W.dwt3d(jnp.asarray(X), cfg.wave_type, cfg.pad_mode))
    coef = packed.transpose(0, 2, 3, 4, 1, 5).reshape(B, ft, fh, fh, 40)

    test_hi = jnp.asarray(rng0.standard_normal((B, ot, 6, 32, 32)).astype(np.float32))
    out = smoke_super_res_chain(
        gd_super, params, jax.random.PRNGKey(2), cfg, coef,
        test_state_hi=test_hi, n_levels=1, channels=C,
        base_pred=jnp.asarray(rng0.standard_normal((B, ot, 6, oh, oh)).astype(np.float32)),
    )
    assert len(out) == 1
    r = out[0]
    assert r["pred"].shape == (B, ot, 6, 32, 32)
    assert np.isfinite(r["pred"]).all()
    assert "mse" in r and "mse_nearest_sr" in r and "mse_linear_sr" in r

    # guided variant: the design-fn gradient must flow through the ringed
    # (ring=1) decode of the super state without NaNs or shape errors
    out_g = smoke_super_res_chain(
        gd_super, params, jax.random.PRNGKey(3), cfg, coef,
        test_state_hi=test_hi, n_levels=1, channels=C,
        w_init=0.1, standard_fixed_ratio=1.0,
    )
    assert np.isfinite(out_g[0]["pred"]).all()


def test_coef_state_to_fields_ring_alignment():
    """ring=1 on an edge-ringed state must decode identically to ring=0 on
    the unringed state (the super training-state layout, data_2d.py:187-198)."""
    from wdno_tpu.eval.smoke_eval import coef_state_to_fields

    C = 42
    B, ot, oh = 2, 8, 16
    ft, fh = 6, 10
    rng0 = np.random.default_rng(3)
    cfg = SmokeEvalConfig(
        rescaler=np.ones(C, np.float32),
        coef_shape=(ft, fh, fh),
        ori_shape=(ot, oh, oh),
        pad_t=8,
        pad_x=14,
    )
    state = jnp.asarray(rng0.standard_normal((B, 8, 14, 14, C)).astype(np.float32))
    ringed = jnp.zeros_like(state)
    ringed = ringed.at[:, :, 1 : fh + 1, 1 : fh + 1, :40].set(state[:, :, :fh, :fh, :40])
    ringed = ringed.at[..., -1].set(state[..., -1])  # smoke-out channel not ringed
    f0, s0 = coef_state_to_fields(state, cfg)
    f1, s1 = coef_state_to_fields(ringed, cfg, ring=1)
    assert np.allclose(np.asarray(f0), np.asarray(f1), atol=1e-6)
    assert np.allclose(np.asarray(s0), np.asarray(s1), atol=1e-6)
