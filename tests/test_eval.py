"""Eval-layer tests: metrics, result IO, coefficient<->field round trips for
both workloads' eval pipelines."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wdno_tpu.data.rescalers import burgers_wavelet_rescaler, smoke_wavelet_rescaler
from wdno_tpu.eval import result_io
from wdno_tpu.eval.burgers_eval import (
    BurgersEvalConfig,
    coef_state_to_uf,
    f_to_coef_channels,
    make_cond_state,
    u0uT_condition_channel,
)
from wdno_tpu.eval.metrics import burgers_control_metric, smoke_sim_metrics
from wdno_tpu.eval.smoke_eval import (
    SmokeEvalConfig,
    coef_state_to_fields,
    control_to_coef_channels,
    init_to_cond_channel,
    make_smoke_cond_state,
)
from wdno_tpu.ops import packing as P
from wdno_tpu.ops import wavelet as W


def _bcfg():
    return BurgersEvalConfig(
        rescaler=burgers_wavelet_rescaler(),
        coef_shape=(41, 60),
        ori_shape=(81, 120),
        is_condition_u0=True,
        is_condition_f=True,
    )


def test_burgers_coef_field_roundtrip():
    """forward DWT -> pack -> coef_state_to_uf recovers (u, f)."""
    rng = np.random.default_rng(0)
    u = rng.standard_normal((2, 81, 120)).astype(np.float32)
    f = rng.standard_normal((2, 80, 120)).astype(np.float32)
    cfg = _bcfg()
    f_ext = np.concatenate([f, np.zeros((2, 1, 120), np.float32)], 1)
    X = jnp.asarray(np.stack([u, f_ext], 1))
    packed = P.pack2d(*W.dwt2d(X, cfg.wave_type, cfg.pad_mode))  # [2,2,41,60,4]
    state = packed.transpose(0, 2, 3, 1, 4).reshape(2, 41, 60, 8)
    state = P.pad_to(state, (64, 64), axes=(1, 2))
    u2, f2 = coef_state_to_uf(state, cfg)
    np.testing.assert_allclose(np.asarray(u2), u, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f2), f, atol=1e-4)


def test_burgers_cond_state_respects_rescaler():
    cfg = _bcfg()
    rng = np.random.default_rng(1)
    u0 = jnp.asarray(rng.standard_normal((2, 120)).astype(np.float32))
    f = jnp.asarray(rng.standard_normal((2, 80, 120)).astype(np.float32))
    cond = make_cond_state(cfg, 2, 9, u0=u0, f_raw=f)
    assert cond.shape == (2, 64, 64, 9)
    # undo the rescale on the f channels and compare to the direct transform
    fc = np.asarray(f_to_coef_channels(f, cfg))
    np.testing.assert_allclose(
        np.asarray(cond[..., 4:8]) * cfg.rescaler[4:8], fc, atol=1e-5
    )
    # u0 rows occupy the top half of the last channel; uT half is zero
    assert np.abs(np.asarray(cond[:, 32:, :, -1])).max() == 0
    assert np.abs(np.asarray(cond[:, :32, :60, -1])).max() > 0


def test_burgers_control_metric_zero_for_perfect_control():
    u_t = jnp.asarray(np.random.default_rng(2).standard_normal((3, 81, 120)), jnp.float32)
    f = jnp.zeros((3, 80, 120))
    m = burgers_control_metric(u_t, f, u_t, wf=1e-3)
    np.testing.assert_allclose(np.asarray(m["J_actual"]), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m["control_energy"]), 0, atol=1e-6)


def test_result_io_merge_and_save(tmp_path):
    p = str(tmp_path / "res.json")
    result_io.save_acc([1.0, 2.0, 3.0], p, "sim", "mse")
    result_io.save_acc([5.0], p, "sim", "mae")
    r = result_io.load_results(p)
    assert r["sim"]["mse"]["mean"] == 2.0
    assert r["sim"]["mse"]["median"] == 2.0
    assert r["sim"]["mse"]["p90"] == pytest.approx(2.8)
    assert r["sim"]["mae"]["mean"] == 5.0
    merged = result_io.data_merge({"a": {"b": 1, "c": 2}}, {"a": {"b": 9}})
    assert merged == {"a": {"b": 9, "c": 2}}


def _scfg():
    return SmokeEvalConfig(rescaler=smoke_wavelet_rescaler())


def test_smoke_coef_field_roundtrip():
    """3D DWT of 5 fields -> packed state -> coef_state_to_fields recovers."""
    rng = np.random.default_rng(3)
    cfg = _scfg()
    X = rng.standard_normal((2, 5, 32, 64, 64)).astype(np.float32)
    packed = P.pack3d(*W.dwt3d(jnp.asarray(X), cfg.wave_type, cfg.pad_mode))
    state40 = packed.transpose(0, 2, 3, 4, 1, 5).reshape(2, 18, 34, 34, 40)
    state = jnp.concatenate(
        [P.pad_to(state40, (24, 40, 40), axes=(1, 2, 3)), jnp.zeros((2, 24, 40, 40, 2))],
        axis=-1,
    )
    fields, smoke = coef_state_to_fields(state, cfg)
    np.testing.assert_allclose(
        np.asarray(fields), np.moveaxis(X, 1, 2), atol=1e-3
    )
    assert smoke.shape == (2, 32)


def test_smoke_smokeout_channel_roundtrip():
    """Packing the smoke-out 1D DWT into the image channel and reading it
    back via the half-row means recovers the signal."""
    rng = np.random.default_rng(4)
    cfg = _scfg()
    s = rng.standard_normal((2, 32)).astype(np.float32)
    a, d = W.dwt1d(jnp.asarray(s), cfg.wave_type, cfg.pad_mode)
    ns = a.shape[-1]
    half = cfg.pad_x // 2
    top = jnp.broadcast_to(a[:, :, None, None], (2, ns, half, cfg.pad_x))
    bot = jnp.broadcast_to(d[:, :, None, None], (2, ns, half, cfg.pad_x))
    img = jnp.concatenate([top, bot], axis=2)
    img = P.pad_to(img, (cfg.pad_t,), axes=(1,))
    state = jnp.zeros((2, cfg.pad_t, cfg.pad_x, cfg.pad_x, 42)).at[..., -1].set(img)
    _, smoke = coef_state_to_fields(state * 0 + state, cfg)
    np.testing.assert_allclose(np.asarray(smoke), s, atol=1e-4)


def test_smoke_cond_state_shapes():
    cfg = _scfg()
    rng = np.random.default_rng(5)
    d0 = jnp.asarray(rng.standard_normal((2, 64, 64)).astype(np.float32))
    control = jnp.asarray(rng.standard_normal((2, 32, 2, 64, 64)).astype(np.float32))
    cond = make_smoke_cond_state(cfg, 42, d0=d0, control=control)
    assert cond.shape == (2, 24, 40, 40, 42)
    assert np.abs(np.asarray(cond[..., :24])).max() == 0  # only cond channels set
    assert np.abs(np.asarray(cond[..., 24:40])).max() > 0
    assert np.abs(np.asarray(cond[..., -2])).max() > 0
    assert np.abs(np.asarray(cond[..., -1])).max() == 0


def test_smoke_sim_metrics_perfect_pred():
    rng = np.random.default_rng(6)
    data = jnp.asarray(rng.standard_normal((2, 8, 6, 16, 16)).astype(np.float32))
    m = smoke_sim_metrics(data, data)
    np.testing.assert_allclose(m["mse"], 0, atol=1e-8)
    np.testing.assert_allclose(m["n_l2"], 0, atol=1e-6)


# ---------------------------------------------------------------- raw mode


def test_burgers_raw_eval_conditioning():
    """Raw (non-wavelet) sim eval: conditioned rows survive sampling and
    extraction recovers (u, f) at the reference contracts."""
    from wdno_tpu.core.diffusion import GaussianDiffusion
    from wdno_tpu.core.schedules import make_schedule
    from wdno_tpu.core.conditioning import burgers_raw_spec
    from wdno_tpu.eval.burgers_eval import eval_sim_batch

    ot, ox, pad, C, B = 9, 12, 16, 2, 3
    spec = burgers_raw_spec((pad, pad, C), (ot, ox),
                            is_condition_u0=True, is_condition_f=True)
    gd = GaussianDiffusion(
        lambda p, x, t: jnp.zeros_like(x), make_schedule("cosine", 8),
        state_shape=(pad, pad, C), spec=spec, sampling_timesteps=4, ddim_eta=0.0,
    )
    cfg = BurgersEvalConfig(
        is_wavelet=False, raw_pad=pad, ori_shape=(ot, ox), coef_shape=(ot, ox),
        is_condition_u0=True, is_condition_f=True,
    )
    rng = np.random.default_rng(0)
    u_t = jnp.asarray(rng.standard_normal((B, ot, ox)), jnp.float32)
    f_t = jnp.asarray(rng.standard_normal((B, ot - 1, ox)), jnp.float32)
    r = eval_sim_batch(gd, None, jax.random.PRNGKey(0), cfg,
                       u_target=u_t, f_raw=f_t, channels=C)
    assert np.isfinite(r["ddpm_mse"]).all()
    np.testing.assert_allclose(r["u"][:, 0], np.asarray(u_t[:, 0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(r["f"], np.asarray(f_t), rtol=1e-5, atol=1e-5)
    assert "coef" not in r


def test_smoke_raw_eval_conditioning_and_guidance():
    """Raw smoke sim eval: conditions respected; raw control guidance
    gradient is finite and pushes smoke-out up."""
    from wdno_tpu.core.diffusion import GaussianDiffusion
    from wdno_tpu.core.schedules import make_schedule
    from wdno_tpu.core.conditioning import smoke_spec
    from wdno_tpu.data.rescalers import smoke_raw_rescaler
    from wdno_tpu.eval.smoke_eval import eval_smoke_sim, make_smoke_guidance

    F, X, C, B = 4, 8, 6, 2
    spec = smoke_spec((F, X, X, C), (F, X, X), is_wavelet=False,
                      is_condition_control=True)
    gd = GaussianDiffusion(
        lambda p, x, t: jnp.zeros_like(x), make_schedule("sigmoid", 8),
        state_shape=(F, X, X, C), spec=spec, sampling_timesteps=4, ddim_eta=0.0,
    )
    cfg = SmokeEvalConfig(
        is_wavelet=False, rescaler=smoke_raw_rescaler(),
        ori_shape=(F, X, X), coef_shape=(F, X, X), is_condition_control=True,
    )
    rng = np.random.default_rng(0)
    test_state = jnp.asarray(rng.random((B, F, C, X, X)), jnp.float32)
    r = eval_smoke_sim(gd, None, jax.random.PRNGKey(0), cfg,
                       test_state=test_state, channels=C)
    assert np.isfinite(r["mse"]).all()
    pred = r["pred"]
    np.testing.assert_allclose(pred[:, 0, 0], np.asarray(test_state[:, 0, 0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pred[:, :, 3:5], np.asarray(test_state[:, :, 3:5]),
                               rtol=1e-4, atol=1e-4)

    # raw control-task guidance: -smoke_out(T); gradient points negative on
    # the smoke-out channel of the last frame (increasing it lowers J)
    ctl_cfg = SmokeEvalConfig(
        is_wavelet=False, rescaler=smoke_raw_rescaler(),
        ori_shape=(F, X, X), coef_shape=(F, X, X), is_condition_control=False,
    )
    guid = make_smoke_guidance(ctl_cfg, init_u=test_state[:, 0, 0],
                               standard_fixed_ratio=1.0)
    g = guid.grad_fn(jnp.asarray(rng.random((B, F, X, X, C)), jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    assert (np.asarray(g)[:, -1, :, :, 5] < 0).all()


def test_control_metric_report_all_variants():
    rng = np.random.default_rng(0)
    u_t = jnp.asarray(rng.standard_normal((3, 5, 12)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((3, 4, 12)), jnp.float32)
    u_c = jnp.asarray(rng.standard_normal((3, 5, 12)), jnp.float32)
    m = burgers_control_metric(u_t, f, u_c, wf=1e-5, report_all=True)
    for k in ("J_actual", "control_energy", "total_J",
              "mse_median", "mae", "mae_median", "nmse", "nmae"):
        assert k in m and np.isfinite(np.asarray(m[k])).all(), k
    # perfect control zeroes every deviation variant
    m0 = burgers_control_metric(u_t, f, u_t, report_all=True)
    for k in ("J_actual", "mse_median", "mae", "mae_median", "nmse", "nmae"):
        assert np.allclose(np.asarray(m0[k]), 0, atol=1e-6), k
