"""Eval-layer tests: metrics, result IO, coefficient<->field round trips for
both workloads' eval pipelines."""

import numpy as np
import jax
import jax.numpy as jnp

from wdno_tpu.data.rescalers import burgers_wavelet_rescaler, smoke_wavelet_rescaler
from wdno_tpu.eval import result_io
from wdno_tpu.eval.burgers_eval import (
    BurgersEvalConfig,
    coef_state_to_uf,
    f_to_coef_channels,
    make_cond_state,
    u0uT_condition_channel,
)
from wdno_tpu.eval.metrics import burgers_control_metric, mse_deviation, smoke_sim_metrics
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
