"""Discrete wavelet transforms (1D/2D/3D) as XLA filter-bank convolutions.

TPU-native replacement for the reference's wavelet layer, which outsources the
DWT to ``pytorch_wavelets``/``ptwt``/``pywt`` (see reference
``burgers/wave_trans.py:1-14``, ``smoke/wave_trans_2d.py:1-3``).  No torch and
no pywt exist on the target, so the filter banks are embedded here and the
transforms are implemented as strided ``lax.conv_general_dilated`` calls that
XLA fuses and tiles onto the TPU vector/matrix units.

Conventions (chosen to mirror pywt semantics used by the reference):

* ``mode='zero'``: signal extended with zeros; coefficient length per level is
  ``floor((n + F - 1) / 2)`` for filter length ``F`` (e.g. 64 -> 34 with
  bior1.3, matching the smoke shapes ``[18, 34, 34]``).
* ``mode='periodization'``: circular extension; odd-length signals are first
  extended by repeating the last sample; coefficient length is ``ceil(n / 2)``
  (e.g. 81x120 -> 41x60 for Burgers, reference ``data_burgers_1d.py:46-48``).
* Analysis phase: ``a[k] = sum_j dec[j] * x[2k + 1 - j]`` (pywt alignment).
* Filter QMF relations (pywt convention):
  ``dec_hi[k] = (-1)**(k+1) * rec_lo[k]``, ``rec_hi[k] = (-1)**k * dec_lo[k]``.

Multi-dimensional transforms are separable: 2D bands are ordered
``(aa, (ad, da, dd))`` and 3D bands ``(aaa, {aad, ada, add, daa, dad, dda,
ddd})`` where letters refer to leading-to-trailing transformed axes,
'a'=approx / 'd'=detail — the same key order the reference packs
(``wave_trans_2d.py:44-52``).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Wavelet",
    "get_wavelet",
    "dwt_max_level",
    "coef_len",
    "dwt1d",
    "idwt1d",
    "dwt1d_conv",
    "idwt1d_conv",
    "dwt2d",
    "idwt2d",
    "dwt3d",
    "idwt3d",
    "wavedec1d",
    "waverec1d",
]

# ---------------------------------------------------------------------------
# Filter banks.
#
# Lowpass decomposition/reconstruction filter taps for the families the
# reference exercises (``train_ddpm_burgers.py:233-241``: bior2.4 / bior1.3 /
# db4 / sym4; ``data_2d.py:142-147``: bior1.3 / bior2.2).  These are standard
# published constants (Daubechies / CDF spline wavelets), identical to the
# pywt tables; the highpass filters are derived via the QMF relations above.
# ---------------------------------------------------------------------------

_SQRT2 = math.sqrt(2.0)

_FILTER_BANK_LO: Dict[str, Tuple[List[float], List[float]]] = {}


def _register(name: str, dec_lo: Sequence[float], rec_lo: Sequence[float]) -> None:
    assert len(dec_lo) == len(rec_lo), name
    _FILTER_BANK_LO[name] = (list(dec_lo), list(rec_lo))


_register(
    "haar",
    [1 / _SQRT2, 1 / _SQRT2],
    [1 / _SQRT2, 1 / _SQRT2],
)
_register("db1", *_FILTER_BANK_LO["haar"])

# Daubechies orthogonal wavelets: rec_lo is the canonical minimum-phase h;
# dec_lo is its reverse.
_DB4_REC_LO = [
    0.23037781330885523,
    0.7148465705525415,
    0.6308807679295904,
    -0.02798376941698385,
    -0.18703481171888114,
    0.030841381835986965,
    0.032883011666982945,
    -0.010597401784997278,
]
_register("db4", _DB4_REC_LO[::-1], _DB4_REC_LO)

_DB5_REC_LO = [
    0.160102397974125,
    0.6038292697974729,
    0.7243085284385744,
    0.13842814590110342,
    -0.24229488706619015,
    -0.03224486958502952,
    0.07757149384006515,
    -0.006241490213011705,
    -0.012580751999015526,
    0.003335725285001549,
]
_register("db5", _DB5_REC_LO[::-1], _DB5_REC_LO)

_SYM4_REC_LO = [
    0.03222310060404270,
    -0.012603967262037833,
    -0.09921954357684722,
    0.29785779560527736,
    0.8037387518059161,
    0.49761866763201545,
    -0.02963552764599851,
    -0.07576571478927333,
]
_register("sym4", _SYM4_REC_LO[::-1], _SYM4_REC_LO)

# Biorthogonal spline (CDF) wavelets.
_register(
    "bior1.3",
    [
        -0.08838834764831845,
        0.08838834764831845,
        0.7071067811865476,
        0.7071067811865476,
        0.08838834764831845,
        -0.08838834764831845,
    ],
    [0.0, 0.0, 0.7071067811865476, 0.7071067811865476, 0.0, 0.0],
)
_register(
    "bior2.2",
    [
        0.0,
        -0.1767766952966369,
        0.3535533905932738,
        1.0606601717798214,
        0.3535533905932738,
        -0.1767766952966369,
    ],
    [0.0, 0.3535533905932738, 0.7071067811865476, 0.3535533905932738, 0.0, 0.0],
)
_register(
    "bior2.4",
    [
        0.0,
        0.03314563036811942,
        -0.06629126073623884,
        -0.1767766952966369,
        0.4198446513295126,
        0.9943689110435825,
        0.4198446513295126,
        -0.1767766952966369,
        -0.06629126073623884,
        0.03314563036811942,
    ],
    [
        0.0,
        0.0,
        0.0,
        0.3535533905932738,
        0.7071067811865476,
        0.3535533905932738,
        0.0,
        0.0,
        0.0,
        0.0,
    ],
)
_register(
    "bior4.4",
    [
        0.0,
        0.03782845550726404,
        -0.023849465019556843,
        -0.11062440441843718,
        0.37740285561283066,
        0.8526986790088938,
        0.37740285561283066,
        -0.11062440441843718,
        -0.023849465019556843,
        0.03782845550726404,
    ],
    [
        0.0,
        -0.06453888262869706,
        -0.04068941760916406,
        0.41809227322161724,
        0.7884856164055829,
        0.41809227322161724,
        -0.04068941760916406,
        -0.06453888262869706,
        0.0,
        0.0,
    ],
)


class Wavelet:
    """Immutable filter bank (dec_lo, dec_hi, rec_lo, rec_hi) as numpy arrays."""

    def __init__(self, name: str):
        if name not in _FILTER_BANK_LO:
            raise ValueError(
                f"unknown wavelet {name!r}; available: {sorted(_FILTER_BANK_LO)}"
            )
        dec_lo, rec_lo = _FILTER_BANK_LO[name]
        self.name = name
        self.dec_lo = np.asarray(dec_lo, dtype=np.float64)
        self.rec_lo = np.asarray(rec_lo, dtype=np.float64)
        # pywt QMF convention.
        signs = (-1.0) ** (np.arange(len(dec_lo)) + 1)
        self.dec_hi = signs * self.rec_lo
        self.rec_hi = -signs * self.dec_lo
        self.filter_len = len(dec_lo)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Wavelet({self.name!r}, len={self.filter_len})"


@functools.lru_cache(maxsize=None)
def get_wavelet(name: str) -> Wavelet:
    return Wavelet(name)


def dwt_max_level(data_len: int, wave: str | Wavelet) -> int:
    """Max useful decomposition level (pywt.dwt_max_level semantics)."""
    w = wave if isinstance(wave, Wavelet) else get_wavelet(wave)
    if data_len < w.filter_len - 1 or w.filter_len < 2:
        return 0
    return int(math.floor(math.log2(data_len / (w.filter_len - 1.0))))


def coef_len(n: int, filter_len: int, mode: str) -> int:
    """Length of DWT coefficients for a length-``n`` axis."""
    if mode == "periodization":
        return (n + 1) // 2
    if mode == "zero":
        return (n + filter_len - 1) // 2
    raise ValueError(f"unsupported mode {mode!r}")


def _check_mode(mode: str) -> None:
    if mode not in ("zero", "periodization"):
        raise ValueError(f"unsupported mode {mode!r}; use 'zero' or 'periodization'")


# ---------------------------------------------------------------------------
# Core 1D analysis / synthesis along the last axis.
# ---------------------------------------------------------------------------


def _conv_stride2(x2d: jnp.ndarray, taps: np.ndarray, pad: Tuple[int, int]) -> jnp.ndarray:
    """Correlate [B, N] signals with [O, F] taps at stride 2 -> [B, O, M].

    Batched 2-output-channel conv; XLA maps it to an implicit matmul on the
    MXU when B is large (training-data pipelines) and fuses it otherwise.
    """
    lhs = x2d[:, None, :]  # [B, 1, N]   (NCW)
    rhs = taps[:, None, :]  # [O, 1, F]   (OIW)
    out = jax.lax.conv_general_dilated(
        lhs,
        jnp.asarray(rhs, dtype=x2d.dtype),
        window_strides=(2,),
        padding=[pad],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out  # [B, O, M]


def _upconv(coefs2d: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Transposed conv: [B, O, L] coefficients, [O, F] synthesis taps -> [B, M].

    Computes ``y[m] = sum_o sum_k c[o, k] * taps[o, m - 2k]`` (full
    convolution of the zero-upsampled coefficients), length ``2L + F - 2``.
    """
    B, O, L = coefs2d.shape
    F = taps.shape[-1]
    # correlation with reversed taps == convolution
    rhs = np.ascontiguousarray(taps[:, ::-1])[None, :, :]  # [1, O, F] (OIW with I=O)
    out = jax.lax.conv_general_dilated(
        coefs2d,
        jnp.asarray(rhs, dtype=coefs2d.dtype),
        window_strides=(1,),
        padding=[(F - 1, F - 1)],
        lhs_dilation=(2,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    # lhs_dilation=2 gives upsampled length 2L-1; full conv length 2L+F-2.
    return out[:, 0, :]


def _dwt_last(x: jnp.ndarray, wave: Wavelet, mode: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level DWT along the last axis. Returns (approx, detail)."""
    _check_mode(mode)
    n = x.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape((-1, n))
    taps = np.stack([wave.dec_lo[::-1], wave.dec_hi[::-1]])  # correlation order
    F = wave.filter_len
    if mode == "periodization":
        if n % 2 == 1:
            x2d = jnp.concatenate([x2d, x2d[:, -1:]], axis=-1)
            n = n + 1
        # wrap-pad so index 2k + t - (F-2) reaches x[-(F-2)] .. x[n-1]
        left = x2d[:, -(F - 2):] if F > 2 else x2d[:, :0]
        x2d = jnp.concatenate([left, x2d], axis=-1)
        out = _conv_stride2(x2d, taps, pad=(0, 0))
    else:  # zero
        out = _conv_stride2(x2d, taps, pad=(F - 2, F - 1))
    a = out[:, 0, :].reshape(lead + (out.shape[-1],))
    d = out[:, 1, :].reshape(lead + (out.shape[-1],))
    return a, d


def _idwt_last(
    a: jnp.ndarray, d: jnp.ndarray, wave: Wavelet, mode: str
) -> jnp.ndarray:
    """Single-level inverse DWT along the last axis.

    Returns length ``2L`` (periodization) or ``2L - F + 2`` (zero) signals;
    callers truncate to the original length exactly as the reference does
    after ``waverec`` (e.g. ``wave_trans.py:109-111``).
    """
    _check_mode(mode)
    assert a.shape == d.shape, (a.shape, d.shape)
    L = a.shape[-1]
    lead = a.shape[:-1]
    F = wave.filter_len
    c2d = jnp.stack([a.reshape((-1, L)), d.reshape((-1, L))], axis=1)  # [B, 2, L]
    taps = np.stack([wave.rec_lo, wave.rec_hi])
    y = _upconv(c2d, taps)  # [B, 2L + F - 2]
    if mode == "periodization":
        # Circular wrap of the linear convolution: the zero-mode result is
        # x_hat[n] = y[n + F - 2]; periodization folds indices mod N back in,
        # i.e. the first F-2 samples of y wrap onto the tail.
        n = 2 * L
        folded = y[:, F - 2 : n + F - 2]
        if F > 2:
            folded = folded.at[:, n - (F - 2) :].add(y[:, : F - 2])
        return folded.reshape(lead + (n,))
    else:
        out = y[:, F - 2 : y.shape[-1] - (F - 2)]
        return out.reshape(lead + (out.shape[-1],))


def _move_axis_last(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.moveaxis(x, axis, -1)


def dwt1d_conv(
    x: jnp.ndarray, wave: str | Wavelet, mode: str = "zero", axis: int = -1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level 1D DWT along ``axis`` via strided filter-bank convs.

    This is the semantics-defining implementation (oracle-tested against
    direct summation); :mod:`.wavelet_fast` derives its banded matrices by
    probing it with an identity batch, and the public :func:`dwt1d`
    dispatches between the two.
    """
    w = wave if isinstance(wave, Wavelet) else get_wavelet(wave)
    axis = axis % x.ndim
    if axis != x.ndim - 1:
        x = _move_axis_last(x, axis)
    a, d = _dwt_last(x, w, mode)
    if axis != a.ndim - 1:
        a = jnp.moveaxis(a, -1, axis)
        d = jnp.moveaxis(d, -1, axis)
    return a, d


def idwt1d_conv(
    a: jnp.ndarray,
    d: jnp.ndarray,
    wave: str | Wavelet,
    mode: str = "zero",
    axis: int = -1,
) -> jnp.ndarray:
    w = wave if isinstance(wave, Wavelet) else get_wavelet(wave)
    axis = axis % a.ndim
    if axis != a.ndim - 1:
        a = _move_axis_last(a, axis)
        d = _move_axis_last(d, axis)
    y = _idwt_last(a, d, w, mode)
    if axis != y.ndim - 1:
        y = jnp.moveaxis(y, -1, axis)
    return y


# Matrix-form dispatch: on small static axes (every hot shape in both
# workloads: 24..120) the banded [2L, n] matrix product of
# :mod:`.wavelet_fast` runs on the MXU and fuses with neighbouring work,
# where the conv lowering measured ~2.5 GB/s on v5e.  Long axes (the
# SR-chain's 1000+-sample rows) stay on the conv path whose FLOPs scale
# O(n * filter_len) instead of O(n^2).  Override with
# ``WDNO_WAVELET_IMPL=conv|matrix``.
_MATRIX_MAX_N = 512


def _use_matrix(n: int) -> bool:
    import os

    pol = os.environ.get("WDNO_WAVELET_IMPL", "auto")
    if pol == "conv":
        return False
    if pol == "matrix":
        return True
    return n <= _MATRIX_MAX_N


def dwt1d(
    x: jnp.ndarray, wave: str | Wavelet, mode: str = "zero", axis: int = -1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level 1D DWT along ``axis``. Returns (approx, detail)."""
    _check_mode(mode)
    if _use_matrix(x.shape[axis]):
        from . import wavelet_fast as _WF

        w = wave if isinstance(wave, Wavelet) else get_wavelet(wave)
        return _WF.dwt1d(x, w.name, mode, axis=axis)
    return dwt1d_conv(x, wave, mode, axis)


def idwt1d(
    a: jnp.ndarray,
    d: jnp.ndarray,
    wave: str | Wavelet,
    mode: str = "zero",
    axis: int = -1,
) -> jnp.ndarray:
    _check_mode(mode)
    if _use_matrix(a.shape[axis]):
        from . import wavelet_fast as _WF

        w = wave if isinstance(wave, Wavelet) else get_wavelet(wave)
        return _WF.idwt1d(a, d, w.name, mode, axis=axis)
    return idwt1d_conv(a, d, wave, mode, axis)


# ---------------------------------------------------------------------------
# Separable 2D / 3D transforms.
# ---------------------------------------------------------------------------


def dwt2d(
    x: jnp.ndarray,
    wave: str | Wavelet,
    mode: str = "zero",
    axes: Tuple[int, int] = (-2, -1),
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Single-level separable 2D DWT.

    Returns ``(aa, (ad, da, dd))`` with letters naming (axes[0], axes[1])
    filters; this is the band triple the reference packs as ``Yh`` channels
    1..3 (``wave_trans.py:30-40``).
    """
    w = wave if isinstance(wave, Wavelet) else get_wavelet(wave)
    ax0, ax1 = axes
    a1, d1 = dwt1d(x, w, mode, axis=ax1)
    aa, da = dwt1d(a1, w, mode, axis=ax0)
    ad, dd = dwt1d(d1, w, mode, axis=ax0)
    return aa, (ad, da, dd)


def idwt2d(
    aa: jnp.ndarray,
    details: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    wave: str | Wavelet,
    mode: str = "zero",
    axes: Tuple[int, int] = (-2, -1),
) -> jnp.ndarray:
    w = wave if isinstance(wave, Wavelet) else get_wavelet(wave)
    ad, da, dd = details
    ax0, ax1 = axes
    a1 = idwt1d(aa, da, w, mode, axis=ax0)
    d1 = idwt1d(ad, dd, w, mode, axis=ax0)
    return idwt1d(a1, d1, w, mode, axis=ax1)


_DET3_KEYS = ("aad", "ada", "add", "daa", "dad", "dda", "ddd")


def dwt3d(
    x: jnp.ndarray,
    wave: str | Wavelet,
    mode: str = "zero",
    axes: Tuple[int, int, int] = (-3, -2, -1),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Single-level separable 3D DWT; detail dict keyed like ptwt.wavedec3
    (reference ``wave_trans_2d.py:44-52``)."""
    w = wave if isinstance(wave, Wavelet) else get_wavelet(wave)
    ax0, ax1, ax2 = axes
    bands: Dict[str, jnp.ndarray] = {"": x}
    for axis in (ax2, ax1, ax0):
        new: Dict[str, jnp.ndarray] = {}
        for key, val in bands.items():
            a, d = dwt1d(val, w, mode, axis=axis)
            new["a" + key] = a
            new["d" + key] = d
        bands = new
    approx = bands.pop("aaa")
    return approx, {k: bands[k] for k in _DET3_KEYS}


def idwt3d(
    approx: jnp.ndarray,
    details: Dict[str, jnp.ndarray],
    wave: str | Wavelet,
    mode: str = "zero",
    axes: Tuple[int, int, int] = (-3, -2, -1),
) -> jnp.ndarray:
    w = wave if isinstance(wave, Wavelet) else get_wavelet(wave)
    ax0, ax1, ax2 = axes
    bands = dict(details)
    bands["aaa"] = approx
    for axis in (ax0, ax1, ax2):
        new: Dict[str, jnp.ndarray] = {}
        seen = set()
        for key in bands:
            rest = key[1:]
            if rest in seen:
                continue
            seen.add(rest)
            new[rest] = idwt1d(bands["a" + rest], bands["d" + rest], w, mode, axis=axis)
        bands = new
    return bands[""]


# ---------------------------------------------------------------------------
# Multi-level 1D transforms (used for the u0/uT condition channels,
# reference ``data_burgers_1d.py:132-147``).
# ---------------------------------------------------------------------------


def wavedec1d(
    x: jnp.ndarray,
    wave: str | Wavelet,
    mode: str = "zero",
    level: int = 1,
    axis: int = -1,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Multi-level 1D DWT. Returns (a_J, [d_1, ..., d_J]) — details ordered
    finest-first, matching pytorch_wavelets' ``Yh`` list."""
    w = wave if isinstance(wave, Wavelet) else get_wavelet(wave)
    details: List[jnp.ndarray] = []
    a = x
    for _ in range(level):
        a, d = dwt1d(a, w, mode, axis=axis)
        details.append(d)
    return a, details


def waverec1d(
    a: jnp.ndarray,
    details: List[jnp.ndarray],
    wave: str | Wavelet,
    mode: str = "zero",
    axis: int = -1,
) -> jnp.ndarray:
    w = wave if isinstance(wave, Wavelet) else get_wavelet(wave)
    x = a
    for d in reversed(details):
        ax = axis % x.ndim
        if x.shape[ax] != d.shape[ax]:
            # zero-mode chains can differ by one sample; truncate like pywt.
            m = min(x.shape[ax], d.shape[ax])
            sl = [slice(None)] * x.ndim
            sl[ax] = slice(0, m)
            x = x[tuple(sl)]
            d = d[tuple(sl)]
        x = idwt1d(x, d, w, mode, axis=axis)
    return x
