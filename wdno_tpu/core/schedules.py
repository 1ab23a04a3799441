"""Diffusion noise schedules and guidance step-size schedulers.

Numerics follow the reference exactly (float64 construction, float32 use):
``burgers/ddpm_burgers/model_utils.py:90-157`` and
``smoke/ddpm/diffusion_2d.py:513-547``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np
import jax.numpy as jnp

__all__ = [
    "linear_beta_schedule",
    "cosine_beta_schedule",
    "sigmoid_beta_schedule",
    "make_beta_schedule",
    "DiffusionSchedule",
    "make_schedule",
    "get_J_scheduler",
]


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    scale = 1000.0 / timesteps
    return np.linspace(scale * 1e-4, scale * 0.02, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    alphas_cumprod = np.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int, start: float = -3.0, end: float = 3.0, tau: float = 1.0
) -> np.ndarray:
    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    v_start, v_end = sig(start / tau), sig(end / tau)
    alphas_cumprod = (-sig((t * (end - start) + start) / tau) + v_end) / (v_end - v_start)
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def make_beta_schedule(name: str, timesteps: int, **kwargs) -> np.ndarray:
    if name == "linear":
        return linear_beta_schedule(timesteps, **kwargs)
    if name == "cosine":
        return cosine_beta_schedule(timesteps, **kwargs)
    if name == "sigmoid":
        return sigmoid_beta_schedule(timesteps, **kwargs)
    raise ValueError(f"unknown beta schedule {name!r}")


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed per-timestep diffusion constants (all shape ``[T]``, f32).

    Mirrors the registered buffers of the reference GaussianDiffusion
    (``diffusion_1d.py:117-156``).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    loss_weight: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_schedule(
    beta_schedule: str = "cosine",
    timesteps: int = 1000,
    objective: str = "pred_noise",
    min_snr_loss_weight: bool = False,
    min_snr_gamma: float = 5.0,
    **schedule_kwargs,
) -> DiffusionSchedule:
    betas = make_beta_schedule(beta_schedule, timesteps, **schedule_kwargs)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    snr = alphas_cumprod / (1 - alphas_cumprod)
    if objective == "pred_noise":
        loss_weight = np.ones_like(snr)
        if min_snr_loss_weight:
            loss_weight = np.minimum(snr, min_snr_gamma) / snr
    elif objective == "pred_x0":
        loss_weight = snr.copy()
        if min_snr_loss_weight:
            loss_weight = np.minimum(snr, min_snr_gamma)
    elif objective == "pred_v":
        loss_weight = snr / (snr + 1)
        if min_snr_loss_weight:
            loss_weight = np.minimum(snr, min_snr_gamma) / (snr + 1)
    else:
        raise ValueError(f"unknown objective {objective!r}")

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
        loss_weight=f32(loss_weight),
    )


def get_J_scheduler(name: Optional[str], timesteps: int = 1000) -> Optional[np.ndarray]:
    """Guidance step-size schedulers as dense ``[timesteps]`` lookup arrays.

    The reference evaluates these per-step on the host
    (``model_utils.py:52-68,90-130``); here they are tables indexed by ``t``
    inside the sampling scan.  The reference hardcodes 1000 sampling steps in
    the scheduler definitions, reproduced via the default.
    """
    if name is None:
        return None
    if name == "cosine":
        # increasing beta-style schedule (reference cosine_beta_J_schedule)
        return cosine_beta_schedule(timesteps).astype(np.float32)
    if name == "sigmoid":
        return sigmoid_beta_schedule(timesteps).astype(np.float32)
    if name == "sigmoid_flip":
        return sigmoid_beta_schedule(timesteps)[::-1].astype(np.float32).copy()
    if name == "plain_cosine":
        x = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64)
        eta = np.cos(x / timesteps)
        return eta[::-1][:timesteps].astype(np.float32).copy()
    raise ValueError(f"unknown J scheduler {name!r}")
