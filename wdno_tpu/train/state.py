"""Train state: params + optimizer + EMA as a single pytree.

Replaces the reference's Accelerate/ema_pytorch/torch-optim stack
(``burgers/ddpm_burgers/train_diffusion.py:39-237``,
``smoke/ddpm/diffusion_2d.py:1061-1309``) with optax and a pytree EMA.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["TrainState", "TrainConfig", "make_optimizer", "create_train_state", "ema_update"]

Params = Any


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    params: Params
    opt_state: optax.OptState
    ema_params: Params


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors the reference training hyperparameters.

    Burgers (``train_diffusion.py:51-64,117-118``): lr 1e-4, betas (0.9,
    0.99), cosine T_max 10000, clip 1.0, EMA 0.995 every 10 (after step 100).
    Smoke (``diffusion_2d.py:1140-1161``): lr 1e-3, MultiStep [50k,150k,300k]
    gamma 0.1.
    """

    learning_rate: float = 1e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.99
    grad_clip: float = 1.0
    lr_schedule: str = "cosine"  # 'cosine' | 'multistep' | 'constant'
    cosine_t_max: int = 10000
    multistep_milestones: tuple = (50_000, 150_000, 300_000)
    multistep_gamma: float = 0.1
    ema_decay: float = 0.995
    ema_update_every: int = 10
    ema_update_after_step: int = 100
    train_num_steps: int = 100_000
    gradient_accumulate_every: int = 1
    # Store Adam moments as ONE flat f32 vector (optax.flatten): the tree
    # form's (8,128)-tiled leaves pad the many co=64 conv kernels 2x in
    # HBM, so the fused optimizer update reads/writes ~2x the true bytes
    # (measured 260 GB/s effective on the 5.1 ms Adam+EMA fusion).  Opt-in
    # because it changes the opt_state checkpoint structure — resumed
    # experiments must keep the value they were created with.
    flat_opt: bool = False


def _lr_fn(cfg: TrainConfig):
    if cfg.lr_schedule == "cosine":
        # torch CosineAnnealingLR(T_max): eta_t = eta_min + (lr-eta_min)
        # * (1+cos(pi*t/T_max))/2, periodic in 2*T_max.
        def fn(step):
            t = step % (2 * cfg.cosine_t_max)
            return cfg.learning_rate * 0.5 * (1 + jnp.cos(jnp.pi * t / cfg.cosine_t_max))

        return fn
    if cfg.lr_schedule == "multistep":
        bounds = {int(m): cfg.multistep_gamma for m in cfg.multistep_milestones}
        return optax.piecewise_constant_schedule(cfg.learning_rate, bounds)
    if cfg.lr_schedule == "constant":
        return lambda step: cfg.learning_rate
    raise ValueError(cfg.lr_schedule)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2),
        optax.scale_by_learning_rate(_lr_fn(cfg)),
    )
    # flatten wraps the whole chain: global-norm over the concatenated
    # vector equals global-norm over the tree, so updates are identical.
    return optax.flatten(tx) if cfg.flat_opt else tx


def create_train_state(params: Params, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    # Copy params: the train step donates the whole TrainState, and donation
    # would otherwise delete the caller's arrays out from under them.
    params = jax.tree_util.tree_map(jnp.copy, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
    )


def ema_update(state: TrainState, cfg: TrainConfig) -> Params:
    """EMA with ema_pytorch-style gating: copy params before
    ``update_after_step``, decay-average every ``update_every`` steps."""
    step = state.step

    def do_copy(_):
        return state.params

    def do_decay(_):
        d = cfg.ema_decay
        return jax.tree_util.tree_map(
            lambda e, p: e * d + p * (1 - d), state.ema_params, state.params
        )

    def do_keep(_):
        return state.ema_params

    due = (step % cfg.ema_update_every) == 0
    warm = step >= cfg.ema_update_after_step
    return jax.lax.cond(
        due,
        lambda _: jax.lax.cond(warm, do_decay, do_copy, None),
        do_keep,
        None,
    )
