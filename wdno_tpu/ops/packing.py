"""Wavelet-coefficient packing/unpacking between band tuples and dense states.

The diffusion models operate on dense, padded, channels-LAST state tensors
(TPU-native layout); these pure functions translate between the separable DWT
band structure and that layout.  They are the JAX equivalents of the
reference's ``coef_to_tensor``/``tensor_to_coef`` pairs
(``burgers/wave_trans.py:18-62``, ``smoke/wave_trans_2d.py:17-58``) and the
nearest-neighbour coefficient upsamplers
(``burgers/ddpm_burgers/wavelet_utils.py:5-16``, ``smoke/ddpm/wave_utils.py``).

Layout contracts
----------------
* Burgers (2D + time treated as an image axis):
  state ``[..., T', X', C]`` with per-field channel quadruple
  ``(ll, ad, da, dd)``; fields stacked ``u`` then ``f`` giving C=8 for the
  base model (reference channel dim 8, ``train_ddpm_burgers.py:137-141``).
* Smoke (2D space + time, 3D DWT): state ``[..., F', H', W', C]`` with
  per-field octuple ``(aaa, aad, ada, add, daa, dad, dda, ddd)``; fields
  stacked ``d, v1, v2, c1, c2`` giving C=40 before the two condition
  channels (reference 42, ``smoke/train_2d.py:88-92``).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp

from .wavelet import _DET3_KEYS

__all__ = [
    "pack2d",
    "unpack2d",
    "pack3d",
    "unpack3d",
    "upsample_coef2d",
    "upsample_coef3d",
    "pad_to",
]


def pack2d(
    aa: jnp.ndarray, details: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
) -> jnp.ndarray:
    """Stack a level-1 2D band tuple into 4 trailing channels.

    aa/details: ``[..., H, W]`` -> ``[..., H, W, 4]`` ordered (ll, ad, da, dd).
    """
    return jnp.stack((aa,) + tuple(details), axis=-1)


def unpack2d(
    packed: jnp.ndarray,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Inverse of :func:`pack2d`; ``[..., H, W, 4]`` -> band tuple."""
    aa = packed[..., 0]
    return aa, (packed[..., 1], packed[..., 2], packed[..., 3])


def pack3d(approx: jnp.ndarray, details: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Stack a level-1 3D band dict into 8 trailing channels.

    ``[..., F, H, W]`` -> ``[..., F, H, W, 8]`` ordered (aaa,) + _DET3_KEYS,
    i.e. the subband order of the reference's per-field blocks
    (``wave_trans_2d.py:44-52``).
    """
    return jnp.stack([approx] + [details[k] for k in _DET3_KEYS], axis=-1)


def unpack3d(packed: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    approx = packed[..., 0]
    details = {k: packed[..., i + 1] for i, k in enumerate(_DET3_KEYS)}
    return approx, details


def upsample_coef2d(w: jnp.ndarray, axes: Tuple[int, int] = (-3, -2)) -> jnp.ndarray:
    """Nearest-neighbour 2x upsampling of coefficient grids along ``axes``.

    Equivalent to reference ``wavelet_utils.upsample_coef`` (repeat each
    sample twice along both coefficient axes); used to build the low-res
    conditioning channels of the super-resolution model.
    """
    for ax in axes:
        w = jnp.repeat(w, 2, axis=ax)
    return w


def upsample_coef3d(
    w: jnp.ndarray, kind: str, axes: Tuple[int, int, int] = (-4, -3, -2)
) -> jnp.ndarray:
    """2x nearest upsampling in 'time' (axis 0 of axes) or 'space' (axes 1,2).

    Mirrors ``smoke/ddpm/wave_utils.py:1-14``.
    """
    t_ax, h_ax, w_ax = axes
    if kind == "time":
        return jnp.repeat(w, 2, axis=t_ax)
    if kind == "space":
        return jnp.repeat(jnp.repeat(w, 2, axis=h_ax), 2, axis=w_ax)
    raise ValueError(f"kind must be 'time' or 'space', got {kind!r}")


def pad_to(
    x: jnp.ndarray,
    target: Sequence[int],
    axes: Sequence[int],
    mode: str = "constant",
) -> jnp.ndarray:
    """Right-pad ``axes`` of ``x`` up to ``target`` sizes (zeros by default)."""
    pads = [(0, 0)] * x.ndim
    for ax, tgt in zip(axes, target):
        ax = ax % x.ndim
        cur = x.shape[ax]
        if tgt < cur:
            raise ValueError(f"axis {ax}: target {tgt} < current {cur}")
        pads[ax] = (0, tgt - cur)
    if mode == "constant":
        return jnp.pad(x, pads)
    return jnp.pad(x, pads, mode=mode)
