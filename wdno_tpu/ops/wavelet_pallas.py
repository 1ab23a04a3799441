"""Fused Pallas TPU kernel for the separable 2D level-1 DWT / IDWT.

The TPU-native equivalent of the reference's only custom-kernel surface
(its CUDA ops live in the pressure solver; its wavelet transforms are
outsourced to torch libs — SURVEY §2.4 requires both as first-class device
kernels here).

One kernel invocation processes a [TB, T, X] tile entirely in VMEM:
``Y = A_t @ X @ A_x^T`` with the banded analysis matrices of
:mod:`.wavelet_fast` (both bands stacked, so the four 2D bands come out of
two MXU matmuls), reading the input from HBM exactly once and writing the
band-packed output once — bandwidth-optimal, no intermediate HBM traffic,
no transposes.

Falls back to interpret mode automatically off-TPU (tests run on CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavelet_fast import analysis_matrix, synthesis_matrix

__all__ = ["dwt2d_fused", "idwt2d_fused"]


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _dwt2d_kernel(x_ref, at_ref, ax_ref, o_ref):
    # one batch element per grid step: pure 2D matmuls, Mosaic-friendly
    x = x_ref[0]  # [T, X]
    at = at_ref[...]  # [2Lt, T]
    ax = ax_ref[...]  # [2Lx, X]
    y = jnp.dot(at, x, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [2Lt, X]
    z = jax.lax.dot_general(
        y, ax,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [2Lt, 2Lx]
    o_ref[0] = z


@functools.partial(jax.jit, static_argnames=("wave", "mode", "tile"))
def dwt2d_fused(
    x: jnp.ndarray, wave: str = "bior2.4", mode: str = "periodization", tile: int = 8
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Level-1 2D DWT over the trailing two axes of ``x [..., T, X]``.

    Returns the standard band tuple ``(aa, (ad, da, dd))`` with coefficient
    shapes matching :func:`wdno_tpu.ops.wavelet.dwt2d` exactly.
    """
    lead = x.shape[:-2]
    T, X = x.shape[-2:]
    xb = x.reshape((-1, T, X)).astype(jnp.float32)
    B = xb.shape[0]

    at_lo, at_hi = analysis_matrix(wave, T, mode)
    ax_lo, ax_hi = analysis_matrix(wave, X, mode)
    At = np.concatenate([at_lo, at_hi], 0).astype(np.float32)  # [2Lt, T]
    Ax = np.concatenate([ax_lo, ax_hi], 0).astype(np.float32)  # [2Lx, X]
    Lt, Lx = at_lo.shape[0], ax_lo.shape[0]

    out = pl.pallas_call(
        _dwt2d_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, X), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * Lt, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * Lx, X), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * Lt, 2 * Lx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * Lt, 2 * Lx), jnp.float32),
        interpret=not _on_tpu(),
    )(xb, jnp.asarray(At), jnp.asarray(Ax))

    out = out[:B].reshape(lead + (2 * Lt, 2 * Lx))
    aa = out[..., :Lt, :Lx]
    da = out[..., Lt:, :Lx]
    ad = out[..., :Lt, Lx:]
    dd = out[..., Lt:, Lx:]
    # NOTE band naming: first letter = leading (time) axis filter.  The
    # leading-axis highpass lives in rows Lt:; trailing-axis highpass in
    # cols Lx:.  (ad, da, dd) per wavelet.dwt2d convention: ad = approx on
    # time/detail on space -> rows :Lt, cols Lx:.
    return aa, (ad, da, dd)


def _idwt2d_kernel(c_ref, st_ref, sx_ref, o_ref):
    c = c_ref[0]  # [2Lt, 2Lx]
    st = st_ref[...]  # [T, 2Lt]
    sx = sx_ref[...]  # [X, 2Lx]
    y = jnp.dot(st, c, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [T, 2Lx]
    z = jax.lax.dot_general(
        y, sx,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [T, X]
    o_ref[0] = z


@functools.partial(jax.jit, static_argnames=("wave", "mode", "tile"))
def idwt2d_fused(
    aa, details, wave: str = "bior2.4", mode: str = "periodization", tile: int = 8
):
    """Inverse of :func:`dwt2d_fused`; output length matches
    :func:`wdno_tpu.ops.wavelet.idwt2d`."""
    ad, da, dd = details
    lead = aa.shape[:-2]
    Lt, Lx = aa.shape[-2:]
    packed = jnp.concatenate(
        [jnp.concatenate([aa, ad], -1), jnp.concatenate([da, dd], -1)], -2
    ).reshape((-1, 2 * Lt, 2 * Lx)).astype(jnp.float32)
    B = packed.shape[0]

    st_lo, st_hi = synthesis_matrix(wave, Lt, mode)
    sx_lo, sx_hi = synthesis_matrix(wave, Lx, mode)
    St = np.concatenate([st_lo, st_hi], 1).astype(np.float32)  # [T, 2Lt]
    Sx = np.concatenate([sx_lo, sx_hi], 1).astype(np.float32)  # [X, 2Lx]
    T, X = St.shape[0], Sx.shape[0]

    out = pl.pallas_call(
        _idwt2d_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 2 * Lt, 2 * Lx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2 * Lt), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((X, 2 * Lx), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, X), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, X), jnp.float32),
        interpret=not _on_tpu(),
    )(packed, jnp.asarray(St), jnp.asarray(Sx))
    return out[:B].reshape(lead + (T, X))
