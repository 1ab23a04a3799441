"""Per-channel RESCALER tables (channels-last vectors).

The reference hardcodes per-subband rescaling constants derived from data
maxima (``burgers/train_ddpm_burgers.py:229-249``, ``smoke/ddpm/data_2d.py:
53,143-151``).  Shipped verbatim for parity; :func:`derive_rescaler`
recomputes them from data the way the reference's prep scripts do
(``wave_trans_2d.py:162-170``: ceil(max)+1 per subband).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "burgers_wavelet_rescaler",
    "burgers_raw_rescaler",
    "smoke_raw_rescaler",
    "smoke_wavelet_rescaler",
    "derive_rescaler",
]

# [u_ll, u_b1, u_b2, u_b3, f_ll, f_b1, f_b2, f_b3]
_BURGERS_TABLES = {
    ("bior2.4", "periodization"): [10, 3, 3, 1, 21, 5, 5, 1],
    ("bior1.3", "periodization"): [8, 5, 4, 2, 21, 4, 3, 1],
    ("db4", "periodization"): [8, 4, 3, 2, 21, 3, 3, 1],
    ("sym4", "periodization"): [8, 5, 4, 2, 21, 6, 6, 2],
}

# 42 channels: 5 fields x 8 subbands + [init_density_dwt, smokeout]
_SMOKE_TABLES = {
    "bior2.2": [4, 2, 2, 1, 2, 2, 1, 1, 42, 10, 21, 8, 15, 3, 5, 2, 51, 18, 8, 5,
                16, 6, 4, 2, 42, 8, 17, 6, 15, 3, 5, 2, 51, 18, 9, 5, 13, 5, 3, 2,
                3, 2],
    "bior1.3": [4, 2, 2, 2, 2, 2, 1, 1, 37, 12, 15, 11, 19, 6, 11, 5, 44, 24, 9,
                10, 16, 9, 6, 6, 37, 10, 15, 8, 19, 5, 11, 5, 43, 24, 9, 10, 16, 9,
                5, 5, 3, 2],
}


def burgers_wavelet_rescaler(
    wave_type: str = "bior2.4",
    pad_mode: str = "periodization",
    is_super_model: bool = False,
    has_condition_channel: bool = True,
) -> np.ndarray:
    """Channel-wise rescaler for the Burgers wavelet state (channels-last).

    Reference ``train_ddpm_burgers.py:232-249``: base 8 channels, doubled for
    the super model's low-res block, +10 for the u0/uT condition channel.
    """
    key = (wave_type, pad_mode)
    if key not in _BURGERS_TABLES:
        raise ValueError(f"no rescaler table for {key}; use derive_rescaler")
    r = list(_BURGERS_TABLES[key])
    if is_super_model:
        r = r + r
    if has_condition_channel:
        r = r + [10]
    return np.asarray(r, np.float32)


def burgers_raw_rescaler() -> np.ndarray:
    return np.asarray([10.0], np.float32)


def smoke_raw_rescaler() -> np.ndarray:
    """[d, v1, v2, c1, c2, smokeout] (reference ``data_2d.py:53``)."""
    return np.asarray([3, 20, 20, 17, 19, 1], np.float32)


def smoke_wavelet_rescaler(wave_type: str = "bior1.3", is_super_model: bool = False) -> np.ndarray:
    """42-channel (82 super) rescaler (reference ``data_2d.py:142-151``)."""
    if wave_type not in _SMOKE_TABLES:
        raise ValueError(f"no rescaler table for {wave_type!r}")
    r = list(_SMOKE_TABLES[wave_type])
    if is_super_model:
        r = r[:40] + r[:40] + r[-2:]
    return np.asarray(r, np.float32)


def derive_rescaler(coef_stack: np.ndarray, axis_channels: int = -1) -> np.ndarray:
    """int(max|coef|)+1 per channel (floor+1 for positive maxima) — the
    reference's derivation rule, ``int(...abs().max())+1``
    (``wave_trans_2d.py:162-170``)."""
    moved = np.moveaxis(coef_stack, axis_channels, -1)
    flat = np.abs(moved).reshape(-1, moved.shape[-1])
    return (np.floor(flat.max(axis=0)).astype(np.int64) + 1).astype(np.float32)
