"""Matrix-form wavelet transforms: DWT/IDWT as MXU matmuls.

The conv-based reference implementation (:mod:`.wavelet`) pays a full HBM
round-trip plus a transpose per axis (~2.5 GB/s measured on v5e).  For the
static shapes this framework uses (64/81/120/34/40...), the 1D DWT along an
axis is exactly a banded ``[2L, n]`` matrix product — so a separable 2D/3D
transform becomes two/three dense matmuls that XLA tiles onto the MXU with
one intermediate, and the whole thing fuses with neighbouring elementwise
work.

The analysis/synthesis matrices are derived *from the conv implementation
itself* (applied to an identity batch), so exactness is inherited from the
oracle-tested path; they are cached per (wave, n, mode).

A fully fused single-VMEM-residency Pallas kernel built on these matrices
was benchmarked and REMOVED in round 3: at the framework's canonical shapes
the transforms are microseconds of MXU work where dispatch overhead
dominates, and the kernel never beat this matrix path (see RESULTS.md,
"wavelet kernel A/B").
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import wavelet as Wref

__all__ = [
    "analysis_matrix",
    "synthesis_matrix",
    "dwt1d",
    "idwt1d",
    "dwt2d",
    "idwt2d",
    "dwt3d",
    "idwt3d",
]


@functools.lru_cache(maxsize=None)
def analysis_matrix(wave: str, n: int, mode: str) -> Tuple[np.ndarray, np.ndarray]:
    """(A_lo, A_hi), each [L, n]: a = A_lo @ x, d = A_hi @ x along an axis.

    Built by running the conv implementation on an identity matrix; for odd
    n under periodization the repeat-last-sample extension is folded in.
    """
    # ensure_compile_time_eval: this may be reached while tracing a jitted
    # caller (e.g. the pallas wrappers); the identity-probe of the conv
    # implementation must evaluate concretely.
    with jax.ensure_compile_time_eval():
        eye = jnp.eye(n, dtype=jnp.float32)
        a, d = Wref.dwt1d_conv(eye, wave, mode, axis=-1)
        a, d = np.asarray(a), np.asarray(d)
    return a.T.copy(), d.T.copy()  # [L, n]


@functools.lru_cache(maxsize=None)
def synthesis_matrix(wave: str, L: int, mode: str) -> Tuple[np.ndarray, np.ndarray]:
    """(S_lo, S_hi), each [n_out, L]: x = S_lo @ a + S_hi @ d."""
    with jax.ensure_compile_time_eval():
        eye = jnp.eye(L, dtype=jnp.float32)
        zero = jnp.zeros((L, L), jnp.float32)
        xa = np.asarray(Wref.idwt1d_conv(eye, zero, wave, mode, axis=-1))
        xd = np.asarray(Wref.idwt1d_conv(zero, eye, wave, mode, axis=-1))
    return xa.T.copy(), xd.T.copy()


def _apply_along(x: jnp.ndarray, M: np.ndarray, axis: int) -> jnp.ndarray:
    """einsum contraction of matrix M [m, n] against axis of x (size n)."""
    axis = axis % x.ndim
    Mj = jnp.asarray(M, x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum(
        "...n,mn->...m", x, Mj, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.moveaxis(y, -1, axis)


def dwt1d(x, wave: str, mode: str = "zero", axis: int = -1):
    n = x.shape[axis]
    A_lo, A_hi = analysis_matrix(wave, n, mode)
    # single fused matmul for both bands
    AB = np.concatenate([A_lo, A_hi], axis=0)
    y = _apply_along(x, AB, axis)
    L = A_lo.shape[0]
    axis = axis % x.ndim
    sl_a = [slice(None)] * x.ndim
    sl_d = [slice(None)] * x.ndim
    sl_a[axis] = slice(0, L)
    sl_d[axis] = slice(L, 2 * L)
    return y[tuple(sl_a)], y[tuple(sl_d)]


def idwt1d(a, d, wave: str, mode: str = "zero", axis: int = -1):
    L = a.shape[axis]
    S_lo, S_hi = synthesis_matrix(wave, L, mode)
    return _apply_along(a, S_lo, axis) + _apply_along(d, S_hi, axis)


def dwt2d(x, wave: str, mode: str = "zero", axes=(-2, -1)):
    ax0, ax1 = axes
    a1, d1 = dwt1d(x, wave, mode, axis=ax1)
    aa, da = dwt1d(a1, wave, mode, axis=ax0)
    ad, dd = dwt1d(d1, wave, mode, axis=ax0)
    return aa, (ad, da, dd)


def idwt2d(aa, details, wave: str, mode: str = "zero", axes=(-2, -1)):
    ad, da, dd = details
    ax0, ax1 = axes
    a1 = idwt1d(aa, da, wave, mode, axis=ax0)
    d1 = idwt1d(ad, dd, wave, mode, axis=ax0)
    return idwt1d(a1, d1, wave, mode, axis=ax1)


def dwt3d(x, wave: str, mode: str = "zero", axes=(-3, -2, -1)):
    ax0, ax1, ax2 = axes
    bands = {"": x}
    for axis in (ax2, ax1, ax0):
        new = {}
        for key, val in bands.items():
            a, d = dwt1d(val, wave, mode, axis=axis)
            new["a" + key] = a
            new["d" + key] = d
        bands = new
    approx = bands.pop("aaa")
    return approx, {k: bands[k] for k in Wref._DET3_KEYS}


def idwt3d(approx, details, wave: str, mode: str = "zero", axes=(-3, -2, -1)):
    ax0, ax1, ax2 = axes
    bands = dict(details)
    bands["aaa"] = approx
    for axis in (ax0, ax1, ax2):
        new = {}
        seen = set()
        for key in bands:
            rest = key[1:]
            if rest in seen:
                continue
            seen.add(rest)
            new[rest] = idwt1d(bands["a" + rest], bands["d" + rest], wave, mode, axis=axis)
        bands = new
    return bands[""]
