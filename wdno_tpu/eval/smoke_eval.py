"""Smoke inference/evaluation: guided sampling + batched re-simulation.

Functional JAX redesign of ``smoke/inference_2d.py``: the design-function
guidance (iDWT inside the gradient, ``:30-66``), condition preparation by
forward DWT (``:242-254``), base/super sampling, and — the reference's
biggest eval bottleneck — control re-simulation, which there spawns one OS
process per sample around a CPU PhiFlow loop (``:330-361``) and here is the
single scanned, batched rollout of :mod:`..solvers.smoke.sim`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.diffusion import GaussianDiffusion, GuidanceConfig
from ..parallel.mesh import maybe_shard_batch
from ..ops import packing as P
from ..ops import wavelet as W
from ..solvers.smoke.scene import SmokeScene
from ..solvers.smoke.sim import control_rollout, solver_out_fields
from .metrics import smoke_sim_metrics

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SmokeEvalConfig:
    wave_type: str = "bior1.3"
    pad_mode: str = "zero"
    rescaler: np.ndarray = None  # [C]
    coef_shape: Tuple[int, int, int] = (18, 34, 34)
    ori_shape: Tuple[int, int, int] = (32, 64, 64)
    pad_t: int = 24
    pad_x: int = 40
    is_condition_control: bool = False
    # raw (non-wavelet) mode: states are [F, X, X, 6] physical channels
    # (d, v1, v2, c1, c2, smoke-out), per-channel rescaled (reference
    # ``--is_wavelet False``, ``data_2d.py:18-116``)
    is_wavelet: bool = True


def coef_state_to_fields(
    state: Array, cfg: SmokeEvalConfig, coef_shape=None, ori_shape=None, *, ring: int = 0
):
    """UNRESCALED state [B, pad_t, pad_x, pad_x, >=42] -> (fields
    [B, ot, 5, ox, ox], smoke_out [B, ot]) via inverse DWT
    (reference ``run_base_model``, ``inference_2d.py:137-152``).

    ``ring=1`` for super-model states, whose valid bands sit one
    edge-replicated cell in from the spatial origin (``data_2d.py:187-198``).
    """
    ft, fh, fw = coef_shape or cfg.coef_shape
    ot, oh, ow = ori_shape or cfg.ori_shape
    B = state.shape[0]
    bands = state[:, :ft, ring : fh + ring, ring : fw + ring, :40].reshape(B, ft, fh, fw, 5, 8)
    bands = jnp.moveaxis(bands, 4, 1)  # [B, 5, ft, fh, fw, 8]
    ap, det = P.unpack3d(bands)
    fields = W.idwt3d(ap, det, cfg.wave_type, cfg.pad_mode)[:, :, :ot, :oh, :ow]
    fields = jnp.moveaxis(fields, 1, 2)  # [B, ot, 5, oh, ow]

    # smoke-out channel: top-half rows hold the approx coef per frame,
    # bottom half the detail (reference Yl_s/Yh_s means, inference_2d.py:145-147)
    half = cfg.pad_x // 2
    sm = state[:, :ft, :, :, -1]
    a = sm[:, :, :half, :].mean(axis=(2, 3))
    d = sm[:, :, half:, :].mean(axis=(2, 3))
    smoke = W.idwt1d(a, d, cfg.wave_type, cfg.pad_mode, axis=-1)[:, :ot]
    return fields, smoke


def control_to_coef_channels(
    control: Array, cfg: SmokeEvalConfig, pad_t=None, pad_x=None, *, ring: int = 0
) -> Array:
    """Raw control [B, F, 2, H, W] -> packed coefficient channels
    [B, pad_t, pad_x, pad_x, 16] (reference ``run_model``, ``:250-254``).

    ``ring=1`` edge-replicates the bands by one spatial cell to match the
    super-model training-state layout (``data_2d.py:187-198``)."""
    pad_t = pad_t or cfg.pad_t
    pad_x = pad_x or cfg.pad_x
    B, F = control.shape[:2]
    c = jnp.moveaxis(control, 2, 1).reshape(B * 2, F, *control.shape[-2:])
    ap, det = W.dwt3d(c, cfg.wave_type, cfg.pad_mode)
    packed = P.pack3d(ap, det)  # [B*2, ft, fh, fw, 8]
    packed = packed.reshape(B, 2, *packed.shape[1:]).transpose(0, 2, 3, 4, 1, 5)
    packed = packed.reshape(B, *packed.shape[1:4], 16)
    if ring:
        packed = jnp.pad(
            packed, ((0, 0), (0, 0), (ring, ring), (ring, ring), (0, 0)), mode="edge"
        )
    return P.pad_to(packed, (pad_t, pad_x, pad_x), axes=(1, 2, 3))


def init_to_cond_channel(d0: Array, cfg: SmokeEvalConfig, pad_t=None, pad_x=None) -> Array:
    """Initial density [B, H, W] -> repeated 2D-DWT condition channel
    [B, pad_t, pad_x, pad_x, 1] (reference ``:245-249``)."""
    pad_t = pad_t or cfg.pad_t
    pad_x = pad_x or cfg.pad_x
    aa, det = W.dwt2d(d0, cfg.wave_type, cfg.pad_mode)
    packed = P.pack2d(aa, det)  # [B, h', w', 4]
    n_rep = pad_t // 4
    cond = jnp.repeat(jnp.moveaxis(packed, 3, 1), n_rep, axis=1)  # [B, pad_t, h', w']
    return P.pad_to(cond, (pad_x, pad_x), axes=(2, 3))[..., None]


def make_smoke_cond_state(
    cfg: SmokeEvalConfig,
    channels: int,
    *,
    d0: Array,
    control: Optional[Array] = None,
    low: Optional[Array] = None,
    pad_t=None,
    pad_x=None,
    ring: int = 0,
) -> Array:
    """Assemble the RESCALED cond_values tensor for the sampler.

    ``ring=1`` for the super model: control bands are edge-replicated by one
    spatial cell (the init channel and low block are not ringed — the low
    block is a 2x upsample of the previous level's bands, which already
    lands on the ringed grid)."""
    pad_t = pad_t or cfg.pad_t
    pad_x = pad_x or cfg.pad_x
    r = jnp.asarray(cfg.rescaler)
    B = d0.shape[0]
    state = jnp.zeros((B, pad_t, pad_x, pad_x, channels))
    state = state.at[..., -2:-1].set(init_to_cond_channel(d0, cfg, pad_t, pad_x) / r[-2])
    if control is not None:
        cc = control_to_coef_channels(control, cfg, pad_t, pad_x, ring=ring)
        state = state.at[..., 24:40].set(cc / r[24:40])
    if low is not None:
        state = state.at[..., 40:80].set(low / r[40:80])
    return state


def raw_state_to_pred(x: Array, cfg: SmokeEvalConfig) -> Array:
    """RESCALED raw state [B, F, X, X, 6] -> pred [B, F, 6, X, X]."""
    return jnp.moveaxis(x * jnp.asarray(cfg.rescaler), -1, 2)


def make_smoke_raw_cond(
    cfg: SmokeEvalConfig,
    channels: int,
    *,
    d0: Array,  # [B, X, X] unrescaled initial density
    control: Optional[Array] = None,  # [B, F, 2, X, X] unrescaled
    num_frames: int = 32,
) -> Array:
    """Raw-mode cond_values: initial density into channel 0 frame 0,
    control into channels 3:5 (reference ``run_model`` raw branch,
    ``inference_2d.py:133``)."""
    r = jnp.asarray(cfg.rescaler)
    B, X = d0.shape[0], d0.shape[-1]
    state = jnp.zeros((B, num_frames, X, X, channels))
    state = state.at[:, 0, :, :, 0].set(d0 / r[0])
    if control is not None:
        state = state.at[..., 3:5].set(jnp.moveaxis(control, 2, -1) / r[3:5])
    return state


def make_smoke_guidance(
    cfg: SmokeEvalConfig,
    *,
    init_u: Array,  # [B, H, W] unrescaled initial density
    w_energy: float = 0.0,
    w_init: float = 0.0,
    standard_fixed_ratio: float = 1.0,
    coeff_schedule: Optional[np.ndarray] = None,
    coef_shape=None,
    ori_shape=None,
    ring: int = 0,
) -> GuidanceConfig:
    """Design-function guidance (reference ``guidance_fn``, ``:30-66``):
    control task: -smoke_out(T) + w_energy*||c||^2 + w_init*||d0-d^||^2;
    simulation task: w_init term only.  ``ring=1`` for super-model states."""
    r = jnp.asarray(cfg.rescaler)
    ot = (ori_shape or cfg.ori_shape)[0]

    def objective(x):
        xs = x * r
        if not cfg.is_wavelet:
            # raw branch (reference ``guidance_fn`` else-arm, ``:56-62``):
            # no init term; success = smoke-out image of the last frame
            if cfg.is_condition_control:
                return 0.0 * xs.sum()
            g_success = xs[:, -1, :, :, 5].mean(axis=(-1, -2)).sum()
            g_energy = (xs[..., 3:5] ** 2).mean(axis=(1, 2, 3, 4)).sum()
            return -g_success + w_energy * g_energy
        fields, smoke = coef_state_to_fields(xs, cfg, coef_shape, ori_shape, ring=ring)
        g_init = ((fields[:, 0, 0] - init_u) ** 2).mean(axis=(-1, -2)).sum()
        if cfg.is_condition_control:
            return w_init * g_init
        g_success = smoke[:, ot - 1].sum()
        g_energy = (fields[:, :, 3:5] ** 2).mean(axis=(1, 2, 3, 4)).sum()
        return -g_success + w_energy * g_energy + w_init * g_init

    return GuidanceConfig(
        grad_fn=jax.grad(objective),
        weight=standard_fixed_ratio,
        schedule=coeff_schedule,
    )


def eval_smoke_control(
    gd: GaussianDiffusion,
    params,
    rng,
    cfg: SmokeEvalConfig,
    scene: SmokeScene,
    *,
    test_state: Array,  # [B, 256, 6, 64, 64] unrescaled reference data
    channels: int = 42,
    w_energy: float = 0.0,
    w_init: float = 0.1,
    standard_fixed_ratio: float = 100.0,
    design_guidance: str = "standard",
    coeff_ratio: float = 0.0,
    chunk: int = 10,
    return_solver_out: bool = False,
    mesh=None,
) -> Dict[str, np.ndarray]:
    """Guided control: sample a control plan, zero its direct interior
    (indirect control, reference ``:337``), re-simulate on-device, score.

    ``design_guidance``: 'standard' scales the gradient by a fixed
    ``standard_fixed_ratio``; 'standard-alpha' by ``coeff_ratio *
    flip(betas)[t]`` (reference ``diffusion_2d.py:736-744``).

    ``return_solver_out``: include the full re-simulated rollout
    ([B, 256, 6, 128, 128], ~100 MB/sample f32) in the result — off by
    default; the metrics path only needs the subsampled comparison."""
    B = test_state.shape[0]
    base = test_state[:, ::8]  # 32 recorded frames at 64^2
    d0 = base[:, 0, 0]
    if design_guidance == "standard":
        guid = make_smoke_guidance(
            cfg, init_u=d0, w_energy=w_energy, w_init=w_init,
            standard_fixed_ratio=standard_fixed_ratio,
        )
    elif design_guidance == "standard-alpha":
        guid = make_smoke_guidance(
            cfg, init_u=d0, w_energy=w_energy, w_init=w_init,
            standard_fixed_ratio=coeff_ratio,
            coeff_schedule=np.asarray(gd.sched.betas)[::-1].copy(),
        )
    else:
        raise ValueError(f"unknown design_guidance {design_guidance!r}")
    if cfg.is_wavelet:
        cond = make_smoke_cond_state(cfg, channels, d0=d0)
    else:
        cond = make_smoke_raw_cond(cfg, channels, d0=d0, num_frames=base.shape[1])
    x = gd.sample(params, rng, B, cond_values=cond, guidance=guid,
                  batch_sharding=maybe_shard_batch(mesh, B))
    if cfg.is_wavelet:
        fields, smoke = coef_state_to_fields(x * jnp.asarray(cfg.rescaler), cfg)
        pred = jnp.concatenate(
            [fields, jnp.broadcast_to(smoke[:, :, None, None, None], fields[:, :, :1].shape)],
            axis=2,
        )  # [B, 32, 6, 64, 64]
    else:
        pred = raw_state_to_pred(x, cfg)

    # indirect control: zero the interior of the sampled control
    pred = pred.at[:, :, 3:5, 8:56, 8:56].set(0.0)
    pred = pred.at[:, 0, 0].set(d0)

    outs, full = [], []
    stride = 256 // pred.shape[1]
    for j in range(0, B, chunk):
        c1 = pred[j : j + chunk, :, 3]
        c2 = pred[j : j + chunk, :, 4]
        vel0 = jnp.zeros((c1.shape[0], 128, 128, 2)).at[..., 1].set(0.2)
        roll = control_rollout(scene, vel0, pred[j : j + chunk, 0, 0], c1, c2)
        so = solver_out_fields(roll, c1, c2)
        # subsample on device: the metrics only compare recorded frames at 64^2
        outs.append(np.asarray(so[:, ::stride, :, ::2, ::2]))
        if return_solver_out:
            full.append(np.asarray(so))
    data_cur = np.concatenate(outs)  # [B, 32, 6, 64, 64]

    m = smoke_sim_metrics(pred, jnp.asarray(data_cur), w_energy=w_energy)
    m["pred"] = np.asarray(pred)
    if return_solver_out:
        m["solver_out"] = np.concatenate(full)  # [B, 256, 6, 128, 128]
    return m


def smoke_super_res_chain(
    gd_super: GaussianDiffusion,
    params_super,
    rng,
    cfg: SmokeEvalConfig,
    sampled_coef: Array,  # [B, ft, fh, fw, 40] UNRESCALED base-level bands
    *,
    test_state_hi: Array,  # [B, 32, 6, X_hi, X_hi] unrescaled ground truth
    n_levels: int = 1,
    channels: int = 82,
    w_init: float = 0.0,
    standard_fixed_ratio: float = 0.0,
    base_pred: Optional[Array] = None,  # [B, ot, 6, oh, ow] base-level pred
) -> List[Dict[str, np.ndarray]]:
    """Zero-shot spatial super-resolution chain (reference ``run_super_model``,
    ``inference_2d.py:155-232``, simulation task / space downsampling).

    Per level: nearest-upsample the previously sampled bands into the low-res
    condition block (40:80), DWT the fine-resolution conditions (init density
    at C-2, control bands at 24:40 — the latter edge-replicated by one ring
    to match the super training states, ``data_2d.py:187-198``), sample the
    refinement model, inverse-DWT, score against ground truth alongside
    nearest/linear interpolation baselines (``inference_2d.py:428-445``).
    """
    r = jnp.asarray(cfg.rescaler)
    B, ft = sampled_coef.shape[0], sampled_coef.shape[1]
    ot = cfg.ori_shape[0]
    oh = cfg.ori_shape[1]

    # previous level's physical-space prediction, for SR baselines
    prev_fields = base_pred
    coef = sampled_coef
    out: List[Dict[str, np.ndarray]] = []
    for k in range(n_levels):
        oh_next = oh * 2 ** (k + 1)
        sub = test_state_hi.shape[-1] // oh_next
        if sub < 1:
            break
        gt = test_state_hi[:, :, :, ::sub, ::sub]  # [B, 32, 6, oh_next, oh_next]
        d0 = gt[:, 0, 0]
        control = gt[:, :, 3:5]
        pad_t, pad_x = cfg.pad_t, cfg.pad_x * 2 ** (k + 1)

        # this level's band grid: 2x the previous level's, minus the ring
        fh_next = 2 * coef.shape[2] - 2

        # low block: 2x nearest upsample of the previous bands == fine grid + ring
        low = P.upsample_coef3d(coef, "space", axes=(1, 2, 3))
        assert low.shape[2] == fh_next + 2, (low.shape, fh_next)
        low = P.pad_to(low, (pad_t, pad_x, pad_x), axes=(1, 2, 3))

        lvl_cfg = dataclasses.replace(
            cfg, coef_shape=(ft, fh_next, fh_next),
            ori_shape=(ot, oh_next, oh_next), pad_t=pad_t, pad_x=pad_x,
        )
        # control bands ringed to the super-state layout; init/low unringed
        cond = make_smoke_cond_state(
            lvl_cfg, channels, d0=d0, control=control, low=low, ring=1
        )

        from ..core.conditioning import smoke_spec

        spec = smoke_spec(
            (pad_t, pad_x, pad_x, channels), (ft, fh_next + 2, fh_next + 2),
            is_condition_control=True, is_super_model=True,
        )
        gd_lvl = gd_super.with_shape((pad_t, pad_x, pad_x, channels), spec)
        guid = None
        if w_init or standard_fixed_ratio:
            guid = make_smoke_guidance(
                lvl_cfg, init_u=d0, w_init=w_init,
                standard_fixed_ratio=standard_fixed_ratio, ring=1,
            )
        rng, sub_rng = jax.random.split(rng)
        x = gd_lvl.sample(params_super, sub_rng, B, cond_values=cond, guidance=guid)

        # decode: strip the edge ring, inverse-DWT the 40 field bands
        fields, smoke = coef_state_to_fields(x * r, lvl_cfg, ring=1)
        pred = jnp.concatenate(
            [fields, jnp.broadcast_to(smoke[:, :, None, None, None], fields[:, :, :1].shape)],
            axis=2,
        )
        pred = pred.at[:, 0, 0].set(d0)

        m = smoke_sim_metrics(pred, gt)
        # interpolation baselines from the previous level's resolution
        base_fields = prev_fields if prev_fields is not None else None
        if base_fields is not None:
            tgt_shape = base_fields.shape[:3] + (oh_next, oh_next)
            for name, method in (("nearest", "nearest"), ("linear", "linear")):
                up = jax.image.resize(base_fields, tgt_shape, method=method)
                mb = smoke_sim_metrics(up, gt)
                for mk in ("mse", "n_l2"):
                    if mk in mb:
                        m[f"{mk}_{name}_sr"] = mb[mk]
        m["pred"] = np.asarray(pred)
        out.append(m)
        prev_fields = pred
        coef = x[:, :ft, 1 : fh_next + 1, 1 : fh_next + 1, :40] * r[:40]
    return out


def eval_smoke_sim(
    gd: GaussianDiffusion,
    params,
    rng,
    cfg: SmokeEvalConfig,
    *,
    test_state: Array,  # [B, 32, 6, nx, nx] unrescaled reference data
    channels: int = 42,
    w_init: float = 0.0,
    standard_fixed_ratio: float = 0.0,
    mesh=None,
) -> Dict[str, np.ndarray]:
    """Conditioned simulation: sample fields given (d0, control), compare
    to stored test sims (reference ``multi_evaluate`` sim branch)."""
    B = test_state.shape[0]
    sub = test_state.shape[-1] // cfg.ori_shape[-1]
    base = test_state[:, :, :, ::sub, ::sub]
    d0 = base[:, 0, 0]
    control = base[:, :, 3:5]
    guid = None
    if w_init or standard_fixed_ratio:
        guid = make_smoke_guidance(
            cfg, init_u=d0, w_init=w_init, standard_fixed_ratio=standard_fixed_ratio
        )
    if cfg.is_wavelet:
        cond = make_smoke_cond_state(cfg, channels, d0=d0, control=control)
    else:
        cond = make_smoke_raw_cond(cfg, channels, d0=d0, control=control,
                                   num_frames=base.shape[1])
    x = gd.sample(params, rng, B, cond_values=cond, guidance=guid,
                  batch_sharding=maybe_shard_batch(mesh, B))
    if cfg.is_wavelet:
        fields, smoke = coef_state_to_fields(x * jnp.asarray(cfg.rescaler), cfg)
        pred = jnp.concatenate(
            [fields, jnp.broadcast_to(smoke[:, :, None, None, None], fields[:, :, :1].shape)],
            axis=2,
        )
    else:
        pred = raw_state_to_pred(x, cfg)
    pred = pred.at[:, 0, 0].set(d0)
    m = smoke_sim_metrics(pred, base)
    m["pred"] = np.asarray(pred)
    if cfg.is_wavelet:
        ft, fh, fw = cfg.coef_shape
        m["coef"] = np.asarray((x * jnp.asarray(cfg.rescaler))[:, :ft, :fh, :fw, :40])
    return m
