"""Declarative hard-conditioning for diffusion states.

The reference scatters ~10 implicit channel-layout contracts across
``set_condition`` index-writes re-applied at every sampler step
(``diffusion_1d.py:276-307``, ``diffusion_2d.py:1008-1033``).  Here the whole
contract is reified once as two static masks over the (channels-last) state:

* ``cond_mask`` — 1 where the state is clamped to externally supplied values
  (initial condition, force/control, low-res coefficients, ...);
* ``pad_mask`` — 1 where the state is clamped to zero (outside the valid
  coefficient region).

Every sampler step is then one fused ``where``; the training-loss target is
``noise * keep_mask`` — exactly the reference's behaviour of zeroing the
noise target at conditioned/padded locations (``diffusion_1d.py:606-637``).

All masks are built in numpy at trace time (static w.r.t. XLA), one spec per
resolution bucket for the super-resolution models.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

__all__ = ["ConditionSpec", "burgers_wavelet_spec", "burgers_raw_spec", "smoke_spec"]


@dataclasses.dataclass(frozen=True)
class ConditionSpec:
    """Static conditioning masks over a channels-last state (no batch dim)."""

    cond_mask: np.ndarray  # float32, state shape
    pad_mask: np.ndarray  # float32, state shape

    def __post_init__(self):
        overlap = (self.cond_mask * self.pad_mask).max() if self.cond_mask.size else 0
        assert overlap == 0, "cond and pad masks must be disjoint"

    @property
    def keep_mask(self) -> np.ndarray:
        return 1.0 - self.cond_mask - self.pad_mask

    def apply(self, x: jnp.ndarray, values: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Clamp conditioned entries of ``x`` to ``values`` and padding to 0."""
        keep = jnp.asarray(self.keep_mask, x.dtype)
        out = x * keep
        if values is not None:
            out = out + values * jnp.asarray(self.cond_mask, x.dtype)
        return out

    def mask_target(self, target: jnp.ndarray) -> jnp.ndarray:
        """Zero the loss target at conditioned + padded locations."""
        return target * jnp.asarray(self.keep_mask, target.dtype)


def _zeros(shape) -> np.ndarray:
    return np.zeros(shape, np.float32)


def burgers_wavelet_spec(
    state_shape: Tuple[int, int, int],
    coef_shape: Tuple[int, int],
    *,
    is_condition_pad: bool = True,
    is_condition_u0: bool = False,
    is_condition_uT: bool = False,
    is_condition_f: bool = False,
    is_super_model: bool = False,
) -> ConditionSpec:
    """Burgers wavelet-space conditioning over state ``[T', X', C]``.

    Channel contract (reference ``diffusion_1d.py:276-288`` transposed to
    channels-last): 0:4 = u bands, 4:8 = f bands, [8:16] = low-res bands for
    the super model, last channel = packed u0/uT condition rows.

    ``coef_shape`` is the valid (rows, cols) region; for the super model the
    reference bumps rows by +1 for the repeated odd timestep
    (``diffusion_1d.py:317`` / ``:536``) — callers pass the bumped value.
    """
    T, X, C = state_shape
    nt, nx = coef_shape
    cond = _zeros(state_shape)
    pad = _zeros(state_shape)

    if is_condition_f:
        cond[:nt, :nx, 4:8] = 1.0
    if is_super_model:
        cond[:nt, :nx, 8:16] = 1.0
    # u0 occupies the top half rows of the last channel, uT the bottom half
    # (reference writes :T//2 and T//2: of channel -1, diffusion_1d.py:279-281
    # with u built from rows [:nt/2] / [nt/2:] of the padded channel).
    if is_condition_u0:
        cond[: T // 2, :nx, C - 1] = 1.0
    if is_condition_uT:
        cond[T // 2 :, :nx, C - 1] = 1.0

    if is_condition_pad:
        # rows beyond the coefficient region: all channels except the last
        pad[nt:, :, : C - 1] = 1.0
        # cols beyond the region: every channel
        pad[:, nx:, :] = 1.0
        pad = pad * (1.0 - cond)

    return ConditionSpec(cond_mask=cond, pad_mask=pad)


def burgers_raw_spec(
    state_shape: Tuple[int, int, int],
    coef_shape: Tuple[int, int],
    *,
    is_condition_pad: bool = True,
    is_condition_u0: bool = False,
    is_condition_uT: bool = False,
    is_condition_f: bool = False,
    is_super_model: bool = False,
) -> ConditionSpec:
    """Raw (non-wavelet) Burgers conditioning over ``[T', X', C]`` with
    channels (u, f[, low_u, low_f]); reference ``diffusion_1d.py:290-307``."""
    T, X, C = state_shape
    nt, nx = coef_shape
    cond = _zeros(state_shape)
    pad = _zeros(state_shape)

    if is_condition_u0:
        cond[0, :nx, 0] = 1.0
    if is_condition_uT:
        if is_super_model:
            cond[nt - 2 : nt, :nx, 0] = 1.0
        else:
            cond[nt - 1, :nx, 0] = 1.0
    if is_condition_f:
        cond[: nt - 1, :nx, 1] = 1.0
    if is_super_model:
        cond[:nt, :nx, 2:4] = 1.0

    if is_condition_pad:
        pad[nt:, :, 0] = 1.0
        pad[nt - 1 :, :, 1] = 1.0
        pad[:, nx:, :] = 1.0
        pad = pad * (1.0 - cond)

    return ConditionSpec(cond_mask=cond, pad_mask=pad)


def smoke_spec(
    state_shape: Tuple[int, int, int, int],
    coef_shape: Sequence[int],
    *,
    is_wavelet: bool = True,
    is_condition_control: bool = False,
    is_condition_pad: bool = True,
    is_super_model: bool = False,
) -> ConditionSpec:
    """Smoke conditioning over state ``[F', H', W', C]``.

    Wavelet channel contract (reference ``diffusion_2d.py:1008-1033``):
    0:40 field bands (d, v1, v2, c1, c2 x 8), 24:40 control bands,
    [40:80] low-res bands (super), C-2 repeated init-density DWT, C-1
    smoke-out rows.  For the super model the reference bumps ``coef_shape``
    (+2 on time or space axes, ``diffusion_2d.py:991-996``) — callers pass
    the bumped shape.
    """
    F, H, Wd, C = state_shape
    ft, fh, fw = coef_shape
    cond = _zeros(state_shape)
    pad = _zeros(state_shape)

    if is_wavelet:
        cond[:, :, :, C - 2] = 1.0  # initial density (every frame)
        if is_condition_control:
            cond[:, :, :, 24:40] = 1.0
        if is_super_model:
            cond[:, :, :, 40:80] = 1.0
        if is_condition_pad:
            # frames beyond ft: all channels except the last two, plus the
            # smoke-out channel (but NOT the init channel C-2).
            pad[ft:, :, :, : C - 2] = 1.0
            pad[ft:, :, :, C - 1] = 1.0
            # spatial padding: all channels except smoke-out (C-1)
            pad[:, fh:, :, : C - 1] = 1.0
            pad[:, :, fw:, : C - 1] = 1.0
            pad = np.clip(pad, 0, 1) * (1.0 - cond)
    else:
        cond[0, :, :, 0] = 1.0  # initial density frame
        if is_condition_control:
            cond[:, :, :, 3:5] = 1.0
        # raw mode has no pad conditioning in the reference (64^2 exactly)

    return ConditionSpec(cond_mask=cond, pad_mask=pad)
