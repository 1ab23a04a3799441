"""Burgers evaluation pipelines: conditioned simulation, guided control,
zero-shot super-resolution refinement.

Functional JAX redesign of ``burgers/eval_ddpm_burgers.py`` +
``burgers/ddpm_burgers/test_util.py``: sampling, the guidance autograd
(``jax.grad`` of an iDWT-based objective, traced once into the sampling
scan) and the ground-truth FD solve all run on-device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.diffusion import GaussianDiffusion, GuidanceConfig
from ..ops import packing as P
from ..parallel.mesh import maybe_shard_batch
from ..ops import wavelet as W
from ..solvers.burgers import burgers_solve
from .metrics import burgers_control_metric, mse_deviation

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class BurgersEvalConfig:
    wave_type: str = "bior2.4"
    pad_mode: str = "periodization"
    rescaler: np.ndarray = None  # channels-last, len C
    coef_shape: Tuple[int, int] = (41, 60)
    ori_shape: Tuple[int, int] = (81, 120)
    pad: int = 64
    is_condition_u0: bool = True
    is_condition_uT: bool = False
    is_condition_f: bool = False
    # raw (non-wavelet) mode: states are physical (u, f) channels padded to
    # ``raw_pad`` and divided by the scalar ``raw_rescaler`` (reference
    # ``--is_wavelet False``, ``data_burgers_1d.py:169-214``)
    is_wavelet: bool = True
    raw_rescaler: float = 10.0
    raw_pad: int = 128


def coef_state_to_uf(
    coef8: Array, cfg: BurgersEvalConfig, coef_shape=None, ori_shape=None
) -> Tuple[Array, Array]:
    """[B, pad, pad, >=8] UNRESCALED coefficient state -> (u [B,ot,ox],
    f [B,ot-1,ox]) via inverse DWT (reference ``eval_ddpm_burgers.py:186-195``)."""
    nt, nx = coef_shape or cfg.coef_shape
    ot, ox = ori_shape or cfg.ori_shape
    bands = coef8[:, :nt, :nx, :8]
    stacked = jnp.stack([bands[..., 0:4], bands[..., 4:8]], axis=1)  # [B,2,nt,nx,4]
    aa, det = P.unpack2d(stacked)
    uf = W.idwt2d(aa, det, cfg.wave_type, cfg.pad_mode)[:, :, :ot, :ox]
    return uf[:, 0], uf[:, 1, : ot - 1]


def raw_state_to_uf(
    x: Array, cfg: BurgersEvalConfig, ori_shape=None
) -> Tuple[Array, Array]:
    """RESCALED raw state [B, pad, pad, >=2] -> (u [B,ot,ox], f [B,ot-1,ox])
    (reference raw branch ``eval_ddpm_burgers.py:196``)."""
    ot, ox = ori_shape or cfg.ori_shape
    s = x * cfg.raw_rescaler
    return s[:, :ot, :ox, 0], s[:, : ot - 1, :ox, 1]


def make_raw_cond_state(
    cfg: BurgersEvalConfig,
    batch: int,
    channels: int,
    *,
    u0: Optional[Array] = None,
    uT: Optional[Array] = None,
    f_raw: Optional[Array] = None,
) -> Array:
    """Raw-mode cond_values: conditions are physical rows written straight
    into the (u, f) channels (reference ``diffusion_1d.py:290-307`` raw)."""
    ot, ox = cfg.ori_shape
    r = cfg.raw_rescaler
    state = jnp.zeros((batch, cfg.raw_pad, cfg.raw_pad, channels))
    if u0 is not None:
        state = state.at[:, 0, :ox, 0].set(u0 / r)
    if uT is not None:
        state = state.at[:, ot - 1, :ox, 0].set(uT / r)
    if f_raw is not None:
        state = state.at[:, : ot - 1, :ox, 1].set(f_raw / r)
    return state


def f_to_coef_channels(f_raw: Array, cfg: BurgersEvalConfig, pad: Optional[int] = None) -> Array:
    """Raw f [B, ot-1, ox] -> padded packed coefficient channels
    [B, pad, pad, 4] (reference ``test_util.get_target`` f branch)."""
    pad = pad or cfg.pad
    ot = f_raw.shape[1] + 1
    f_ext = jnp.concatenate(
        [f_raw, jnp.zeros((f_raw.shape[0], 1, f_raw.shape[2]), f_raw.dtype)], axis=1
    )
    aa, det = W.dwt2d(f_ext, cfg.wave_type, cfg.pad_mode)
    packed = P.pack2d(aa, det)  # [B, nt, nx, 4]
    return P.pad_to(packed, (pad, pad), axes=(1, 2))


def u0uT_condition_channel(
    u0: Array, uT: Array, cfg: BurgersEvalConfig, pad: Optional[int] = None
) -> Array:
    """Pack 1D-DWT rows of u0/uT into the condition channel
    [B, pad, pad, 1] (reference ``test_util.get_target:184-198``)."""
    pad = pad or cfg.pad
    B = u0.shape[0]
    rows = jnp.stack([u0, uT], axis=1)  # [B, 2, ox]
    a, d = W.dwt1d(rows, cfg.wave_type, cfg.pad_mode, axis=-1)
    nx = a.shape[-1]
    n_rep = pad // 4
    cond = jnp.zeros((B, pad, pad))
    segs = [a[:, 0], d[:, 0], a[:, 1], d[:, 1]]
    flags = [cfg.is_condition_u0, cfg.is_condition_u0, cfg.is_condition_uT, cfg.is_condition_uT]
    for i, (seg, on) in enumerate(zip(segs, flags)):
        if on:
            tile = jnp.repeat(seg[:, None, :], n_rep, axis=1)
            cond = cond.at[:, i * n_rep : (i + 1) * n_rep, :nx].set(tile)
    return cond[..., None]


def make_cond_state(
    cfg: BurgersEvalConfig,
    batch: int,
    channels: int,
    *,
    u0: Optional[Array] = None,
    uT: Optional[Array] = None,
    f_raw: Optional[Array] = None,
    low_coef: Optional[Array] = None,
    pad: Optional[int] = None,
) -> Array:
    """Assemble the RESCALED cond_values tensor for the sampler."""
    pad = pad or cfg.pad
    r = jnp.asarray(cfg.rescaler)
    state = jnp.zeros((batch, pad, pad, channels))
    if f_raw is not None:
        fc = f_to_coef_channels(f_raw, cfg, pad)
        state = state.at[..., 4:8].set(fc / r[4:8])
    if low_coef is not None:
        state = state.at[..., 8:16].set(low_coef / r[8:16])
    if u0 is not None or uT is not None:
        uTv = uT if uT is not None else jnp.zeros_like(u0)
        u0v = u0 if u0 is not None else jnp.zeros_like(uT)
        cond = u0uT_condition_channel(u0v, uTv, cfg, pad)
        state = state.at[..., -1:].set(cond / r[-1])
    return state


def make_control_guidance(
    cfg: BurgersEvalConfig,
    u_target: Array,
    *,
    wu: float,
    wf: float,
    J_schedule: Optional[np.ndarray] = None,
    coef_shape=None,
    ori_shape=None,
) -> GuidanceConfig:
    """Gradient guidance on the iDWT-reconstructed field
    (reference ``eval_ddpm_burgers.py:122-144`` + ``test_util.py:100-126``)."""
    ot, _ = ori_shape or cfg.ori_shape

    def _to_uf(x):
        if not cfg.is_wavelet:
            return raw_state_to_uf(x, cfg, ori_shape)
        coef = x[..., :8] * jnp.asarray(cfg.rescaler)[:8]
        return coef_state_to_uf(coef, cfg, coef_shape, ori_shape)

    def loss_fn(x):
        u, f = _to_uf(x)
        u0_gt, uf_gt = u_target[:, 0, :], u_target[:, -1, :]
        if cfg.is_condition_f:
            loss_u = ((u[:, 0, :] - u0_gt) ** 2).mean(-1).sum()
        else:
            loss_u = (
                ((u[:, 0, :] - u0_gt) ** 2) + ((u[:, -1, :] - uf_gt) ** 2)
            ).mean(-1).sum()
        loss_f = (f**2).sum()
        return (loss_u + wf * loss_f) * wu

    def grad_fn(x_start):
        g8 = jax.grad(loss_fn)(x_start)
        return g8

    return GuidanceConfig(grad_fn=grad_fn, schedule=J_schedule)


def eval_sim_batch(
    gd: GaussianDiffusion,
    params,
    rng,
    cfg: BurgersEvalConfig,
    *,
    u_target: Array,  # [B, ot, ox_hi] ground-truth states (>= eval res)
    f_raw: Array,  # [B, ot-1, ox] forcing at model resolution
    channels: int = 9,
    guidance: Optional[GuidanceConfig] = None,
    low_coef: Optional[Array] = None,  # [B, pad, pad, 8] RESCALED already? no: raw coef
    mesh=None,
) -> Dict[str, np.ndarray]:
    """Conditioned simulation eval: sample u | (u0, f[, low]), compare to
    stored ground truth (reference ``diffuse_2dconv`` with is_condition_f).
    With ``mesh``, the batch shards over the 'data' axis (multi-chip eval)."""
    B = f_raw.shape[0]
    u0 = u_target[:, 0, :: u_target.shape[-1] // cfg.ori_shape[1]]
    if cfg.is_wavelet:
        cond = make_cond_state(cfg, B, channels, u0=u0, f_raw=f_raw, low_coef=low_coef)
    else:
        cond = make_raw_cond_state(cfg, B, channels, u0=u0, f_raw=f_raw)
    x = gd.sample(params, rng, B, cond_values=cond, guidance=guidance,
                  batch_sharding=maybe_shard_batch(mesh, B))
    if cfg.is_wavelet:
        coef = x * jnp.asarray(cfg.rescaler)
        u, f = coef_state_to_uf(coef, cfg)
        coef8 = np.asarray(coef[..., :8])
    else:
        u, f = raw_state_to_uf(x, cfg)
        coef8 = None
    sub = u_target.shape[-1] // u.shape[-1]
    ddpm_mse = mse_deviation(u[:, 1:], u_target[:, 1 : u.shape[1], ::sub])
    out = {
        "u": np.asarray(u),
        "f": np.asarray(f),
        "ddpm_mse": np.asarray(ddpm_mse),
    }
    if coef8 is not None:
        out["coef"] = coef8
    return out


def eval_control_batch(
    gd: GaussianDiffusion,
    params,
    rng,
    cfg: BurgersEvalConfig,
    *,
    u_target: Array,  # [B, ot, ox]
    wu: float = 120000.0,
    wf: float = 2e-5,
    J_schedule: Optional[np.ndarray] = None,
    channels: int = 9,
    solver_T: float = 8.0,
    solver_factor: int = 16,
    report_all: bool = False,
    mesh=None,
) -> Dict[str, np.ndarray]:
    """Guided control eval: sample (u, f) steering u(T) toward the target,
    re-simulate the sampled f with the FD solver, score J
    (reference ``evaluate``/``metric``; ``solver_factor=16`` is the
    reference's ground-truth solver precision)."""
    B = u_target.shape[0]
    guidance = make_control_guidance(cfg, u_target, wu=wu, wf=wf, J_schedule=J_schedule)
    if cfg.is_wavelet:
        cond = make_cond_state(cfg, B, channels, u0=u_target[:, 0], uT=u_target[:, -1])
    else:
        cond = make_raw_cond_state(cfg, B, channels, u0=u_target[:, 0], uT=u_target[:, -1])
    x = gd.sample(params, rng, B, cond_values=cond, guidance=guidance,
                  batch_sharding=maybe_shard_batch(mesh, B))
    if cfg.is_wavelet:
        coef = x * jnp.asarray(cfg.rescaler)
        u, f = coef_state_to_uf(coef, cfg)
    else:
        u, f = raw_state_to_uf(x, cfg)
        coef = x * cfg.raw_rescaler
    nt = u.shape[1] - 1
    u_ctrl = burgers_solve(
        u_target[:, 0], f, T=solver_T, num_t=nt, s=solver_factor * f.shape[-1]
    )
    m = burgers_control_metric(u_target, f, u_ctrl, wf=wf, report_all=report_all)
    m = {k: np.asarray(v) for k, v in m.items()}
    m["J_diffused"] = np.asarray(
        burgers_control_metric(u_target, f, u, wf=wf)["J_actual"]
    )
    m["u"], m["f"], m["coef"] = np.asarray(u), np.asarray(f), np.asarray(coef[..., :8])
    return m


def super_res_chain(
    gd_super: GaussianDiffusion,
    params_super,
    rng,
    cfg: BurgersEvalConfig,
    sampled_coef: Array,  # [B, nt, nx, 8] UNRESCALED base-level coefficients
    *,
    levels: List[Tuple[Tuple[int, int], Tuple[int, int]]],
    u_target: Array,  # [B, ot_hi, ox_hi] at the finest target resolution
    f_raw_per_level: List[Array],
    channels: int = 17,
) -> List[Dict[str, np.ndarray]]:
    """Zero-shot super-resolution: per level, nearest-upsample the sampled
    coefficients, condition the refinement model on them, sample, repeat
    (reference ``eval_ddpm_burgers.py:305-338``)."""
    from ..core.conditioning import burgers_wavelet_spec

    out = []
    coef = sampled_coef
    for k, ((nt, nx), (ot, ox)) in enumerate(levels):
        pad = cfg.pad * 2 ** (k + 1)
        low = P.upsample_coef2d(coef, axes=(1, 2))
        low = P.pad_to(low, (pad, pad), axes=(1, 2))
        lvl_cfg = dataclasses.replace(cfg, coef_shape=(nt, nx), ori_shape=(ot, ox), pad=pad)
        # rebind the (fully convolutional) super model to this level's padded
        # shape + masks; +1 row bump as in training (diffusion_1d.py:317).
        spec = burgers_wavelet_spec(
            (pad, pad, channels), (nt + 1, nx),
            is_condition_u0=cfg.is_condition_u0, is_condition_uT=cfg.is_condition_uT,
            is_condition_f=cfg.is_condition_f, is_super_model=True,
        )
        gd_lvl = gd_super.with_shape((pad, pad, channels), spec)
        rng, sub_rng = jax.random.split(rng)
        res = eval_sim_batch(
            gd_lvl,
            params_super,
            sub_rng,
            lvl_cfg,
            u_target=u_target[:, :: (u_target.shape[1] - 1) // (ot - 1)],
            f_raw=f_raw_per_level[k],
            channels=channels,
            low_coef=low,
        )
        # interpolation baselines: each level's sample upsampled to the
        # finest GT grid, bilinear and nearest (reference computes both
        # alongside the subsampled-GT MSE, ``eval_ddpm_burgers.py:207-218``)
        u_lvl = jnp.asarray(res["u"])
        for name in ("linear", "nearest"):
            up = jax.image.resize(
                u_lvl, (u_lvl.shape[0],) + u_target.shape[1:], method=name
            )
            res[f"ddpm_mse_{name}_sr"] = np.asarray(
                mse_deviation(up[:, 1:], u_target[:, 1:])
            )
        # feed the refined coefficients to the next level
        coef = jnp.asarray(res["coef"])[:, :nt, :nx, :]
        out.append(res)
    return out
