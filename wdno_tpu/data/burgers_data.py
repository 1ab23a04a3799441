"""Burgers dataset: generation, wavelet-coefficient prep, training states.

Replaces the reference's three-stage pipeline —
``generate_burgers.py`` (GPU solve -> torch pickles), ``wave_trans.py``
(offline DWT -> coef blob) and ``data_burgers_1d.py`` (per-epoch preprocess)
— with jitted JAX generation and a single packed channels-last state array
per resolution, stored as plain ``.npy`` (memory-mappable; fixes the
reference's per-item ``torch.load`` I/O on the smoke side and keeps Burgers
fully vectorized).

State layout ``[N, 64, 64, C]``: channels 0:4 u bands (ll, ad, da, dd),
4:8 f bands, [8:16 low-res bands for super], last channel packed u0/uT
condition rows (reference ``data_burgers_1d.py:20-87``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import wavelet as W
from ..ops import packing as P
from ..solvers.burgers import burgers_solve, make_data_varying_f_indexed
from .rescalers import burgers_wavelet_rescaler

__all__ = [
    "generate_burgers_dataset",
    "build_coef_levels",
    "build_training_states",
    "BurgersWaveletDataset",
]


def generate_burgers_dataset(
    seed: int,
    num_samples: int,
    *,
    nt: int = 80,
    nx: int = 120,
    super_factor: int = 16,
    T: float = 8.0,
    batch_size: int = 256,
    alpha: float = 1.0,
) -> Dict[str, np.ndarray]:
    """Generate ``{u: [N, nt+1, nx], f: [N, nt, nx]}`` with the reference's
    data distribution and solver precision.

    The solver ALWAYS runs on its native grid — s=1920 interior points,
    dt=1/76800 (16x the base 80x120 dataset, ``burgers_data.sh``); datasets
    at other resolutions are coarser/finer *recordings* of that solve, not
    rescaled solves.  This matters for stability: the explicit diffusion
    term has r = visc*dt/dx^2 = 0.48 exactly at s=1920 — solving on a finer
    grid at the same dt diverges.  ``super_factor`` scales the native grid
    relative to the base resolution (16 = reference).
    """
    s = 120 * super_factor
    t_f = 80 * super_factor
    if s % nx or t_f % nt:
        raise ValueError(
            f"(nt={nt}, nx={nx}) must divide the solver-native grid "
            f"({t_f}, {s}); reference resolutions are nx in {{120,...,1920}} "
            f"dividing 1920 and nt dividing 1280"
        )
    dt = 1.0 / 76800 * (1920 / s) ** 2  # diffusion-stability scaling
    base_key = jax.random.PRNGKey(seed)
    us, fs = [], []

    # one fused jitted program per batch: random-field generation, the full
    # FD solve and the strided downsampling all stay on device; only the
    # [bs, nt+1, nx] outputs cross the host boundary.  Sample k is keyed by
    # its global index, so datasets generated with different batch sizes or
    # sample counts agree trajectory-by-trajectory on their common prefix
    # (required by the cross-resolution super-res eval protocol).
    @jax.jit
    def gen_and_solve(start):
        idx = start + jnp.arange(batch_size)
        u0, f = make_data_varying_f_indexed(base_key, idx, s=s, t=t_f, alpha=alpha)
        traj = burgers_solve(u0, f, T=T, num_t=nt, dt=dt, s=s)
        return traj[:, :, :: s // nx], f[:, :: t_f // nt, :: s // nx]

    import time as _time
    n_batches = math.ceil(num_samples / batch_size)
    _t0 = _time.time()
    for i in range(n_batches):
        traj_ds, f_ds = gen_and_solve(jnp.int32(i * batch_size))
        us.append(np.asarray(traj_ds))
        fs.append(np.asarray(f_ds))
        if i % 5 == 0 or i == n_batches - 1:
            print(f"  datagen batch {i + 1}/{n_batches} "
                  f"({(_time.time() - _t0) / (i + 1):.2f}s/batch)", flush=True)
    return {"u": np.concatenate(us)[:num_samples], "f": np.concatenate(fs)[:num_samples]}


def build_coef_levels(
    u: np.ndarray,
    f: np.ndarray,
    *,
    wave_type: str = "bior2.4",
    pad_mode: str = "periodization",
    n_downsample: int = 4,
    batch: int = 4096,
) -> Dict:
    """Level-1 DWT of [u; f] at dyadic downsamplings.

    Mirrors the reference's offline prep (``wave_trans.py:66-127``): stack
    u [N, nt+1, nx] and zero-extended f into X [N, 2, nt+1, nx]; for each
    level i, transform X[..., ::2^i, ::2^i].

    Returns ``{"coef": [level -> [N, nt_i, nx_i, 8]], "shape": [...],
    "ori_shape": [...]}`` with channels (u_ll, u_ad, u_da, u_dd, f_ll,
    f_ad, f_da, f_dd).
    """
    N, nt1, nx = u.shape
    f_ext = np.concatenate([f, np.zeros((N, nt1 - f.shape[1], nx), f.dtype)], axis=1)
    X = np.stack([u, f_ext], axis=1)  # [N, 2, nt+1, nx]

    dwt = jax.jit(
        lambda x: P.pack2d(*W.dwt2d(x, wave_type, pad_mode)),
        static_argnums=(),
    )
    levels, shapes, oris = [], [], []
    for i in range(n_downsample):
        Xs = X[:, :, :: 2**i, :: 2**i]
        outs = []
        for j in range(0, N, batch):
            packed = np.asarray(dwt(jnp.asarray(Xs[j : j + batch])))  # [b,2,ht,wx,4]
            # -> [b, ht, wx, 8] with u bands then f bands
            b, c2, ht, wx, nb = packed.shape
            outs.append(
                packed.transpose(0, 2, 3, 1, 4).reshape(b, ht, wx, c2 * nb)
            )
        arr = np.concatenate(outs)
        levels.append(arr)
        shapes.append(list(arr.shape[1:3]))
        oris.append([Xs.shape[2], Xs.shape[3]])
    return {"coef": levels, "shape": shapes, "ori_shape": oris}


def _condition_channel(
    coef8: np.ndarray,
    ori_shape: Tuple[int, int],
    pad_t: int,
    pad_x: int,
    *,
    wave_type: str,
    pad_mode: str,
    is_condition_u0: bool,
    is_condition_uT: bool,
    batch: int = 4096,
) -> np.ndarray:
    """Build the packed u0/uT condition channel.

    Reference ``data_burgers_1d.py:65-82``: inverse-transform the u/f bands
    to physical u, level-1 1D-DWT rows u[0] and u[-1], tile each coefficient
    row over ``pad_t/4`` rows: [Yl(u0); Yh(u0); Yl(uT); Yh(uT)].
    """
    N = coef8.shape[0]
    nt, nx = coef8.shape[1:3]
    ori_t, ori_x = ori_shape

    def make(chunk):
        u_bands = chunk[..., 0:4]
        f_bands = chunk[..., 4:8]
        stacked = jnp.stack([u_bands, f_bands], axis=1)  # [b,2,nt,nx,4]
        aa, det = P.unpack2d(stacked)
        uf = W.idwt2d(aa, det, wave_type, pad_mode)[:, :, :ori_t, :ori_x]
        u = uf[:, 0]
        rows = u[:, jnp.asarray([0, ori_t - 1]), :]  # [b, 2, ori_x]
        a, d = W.dwt1d(rows, wave_type, pad_mode, axis=-1)  # [b,2,nx']
        n_rep = pad_t // 4
        cond = jnp.zeros((chunk.shape[0], pad_t, pad_x))
        segs = [a[:, 0], d[:, 0], a[:, 1], d[:, 1]]
        for i, seg in enumerate(segs):
            tile = jnp.repeat(seg[:, None, :], n_rep, axis=1)
            cond = cond.at[:, i * n_rep : (i + 1) * n_rep, : seg.shape[-1]].set(tile)
        return cond

    make_j = jax.jit(make)
    outs = []
    for j in range(0, N, batch):
        outs.append(np.asarray(make_j(jnp.asarray(coef8[j : j + batch]))))
    cond = np.concatenate(outs)
    if not is_condition_u0:
        cond[:, : 2 * (pad_t // 4)] = 0
    if not is_condition_uT:
        cond[:, 2 * (pad_t // 4) :] = 0
    return cond[..., None]  # [N, pad_t, pad_x, 1]


def build_training_states(
    db: Dict,
    *,
    level: int = 0,
    is_super_model: bool = False,
    wave_type: str = "bior2.4",
    pad_mode: str = "periodization",
    is_condition_u0: bool = True,
    is_condition_uT: bool = False,
    rescaler: Optional[np.ndarray] = None,
    max_samples: int = 40000,
) -> Tuple[np.ndarray, List[int], List[int]]:
    """Packed, padded, rescaled states for one resolution level.

    Equivalent of ``get_wavelet_super_preprocess`` (``data_burgers_1d.py:
    20-87``).  Returns (states [N, pad, pad, C], coef_shape, ori_shape).
    """
    coef = db["coef"][level][:max_samples]
    N = coef.shape[0]
    nt, nx = coef.shape[1:3]
    ori_t = math.ceil(db["ori_shape"][0][0] / 2**level)
    ori_x = math.ceil(db["ori_shape"][0][1] / 2**level)
    pad = 64 // 2**level

    data = np.array(P.pad_to(coef, (pad, pad), axes=(1, 2)))  # [N, pad, pad, 8] (writable copy)

    if is_super_model:
        sub = db["coef"][level + 1][:max_samples]
        # keep ALL 2*nt_sub = nt+1 upsampled rows: the reference does not
        # truncate (upsample_coef's slice is commented out, wavelet_utils.py:
        # 5-16) and the super cond mask clamps rows :nt+1, so row nt of the
        # low block must hold the upsampled value, not zero — this matches
        # the eval-time SR chain, which also conditions on untruncated
        # upsampled coefficients (eval_ddpm_burgers.py:307-312)
        low = P.upsample_coef2d(sub, axes=(1, 2))[:, :, :nx]
        # repeat the last valid coefficient row (odd timestep count,
        # reference data_burgers_1d.py:61)
        data[:, nt, :, :] = data[:, nt - 1, :, :]
        low = P.pad_to(low, (pad, pad), axes=(1, 2))
        data = np.concatenate([data, np.asarray(low)], axis=-1)

    if is_condition_u0 or is_condition_uT:
        cond = _condition_channel(
            coef,
            (ori_t, ori_x),
            pad,
            pad,
            wave_type=wave_type,
            pad_mode=pad_mode,
            is_condition_u0=is_condition_u0,
            is_condition_uT=is_condition_uT,
        )
        data = np.concatenate([data, cond], axis=-1)

    if rescaler is None:
        rescaler = burgers_wavelet_rescaler(
            wave_type,
            pad_mode,
            is_super_model=is_super_model,
            has_condition_channel=is_condition_u0 or is_condition_uT,
        )
    data = (data / rescaler.reshape(1, 1, 1, -1)).astype(np.float32)
    return data, [nt, nx], [ori_t, ori_x]


def build_raw_states(
    u: np.ndarray,
    f: np.ndarray,
    *,
    level: int = 0,
    is_super_model: bool = False,
    rescaler: float = 10.0,
    pad: int = 128,
    max_samples: int = 40000,
) -> Tuple[np.ndarray, List[int], List[int]]:
    """Raw (non-wavelet) training states [N, pad, pad, C]: channels (u, f)
    (+2 low-res channels for the super model), zero-padded and rescaled —
    the ``get_burgers_preprocess`` equivalent (reference
    ``data_burgers_1d.py:169-214``).
    """
    u = u[:max_samples]
    f = f[:max_samples]
    N, nt1, nx = u.shape
    pad_lvl = pad // 2**level
    u_l = u[:, :: 2**level, :: 2**level]
    f_l = f[:, :: 2**level, :: 2**level]
    shape = [u_l.shape[1], u_l.shape[2]]

    u_p = np.zeros((N, pad_lvl, pad_lvl), np.float32)
    f_p = np.zeros((N, pad_lvl, pad_lvl), np.float32)
    u_p[:, : u_l.shape[1], : u_l.shape[2]] = u_l
    f_p[:, : f_l.shape[1], : f_l.shape[2]] = f_l
    chans = [u_p, f_p]

    if is_super_model:
        u_s = np.repeat(np.repeat(u[:, :: 2 ** (level + 1), :: 2 ** (level + 1)], 2, 1), 2, 2)
        f_s = np.repeat(np.repeat(f[:, :: 2 ** (level + 1), :: 2 ** (level + 1)], 2, 1), 2, 2)
        # repeat the last valid timestep row (odd nt, reference :208)
        nt_sub = f_l.shape[1]
        u_p = u_p.copy()
        u_p[:, nt_sub + 1, :] = u_p[:, nt_sub, :]
        lo_u = np.zeros_like(u_p)
        lo_f = np.zeros_like(f_p)
        lo_u[:, : u_s.shape[1], : u_s.shape[2]] = u_s[:, :pad_lvl, :pad_lvl]
        lo_f[:, : f_s.shape[1], : f_s.shape[2]] = f_s[:, :pad_lvl, :pad_lvl]
        chans = [u_p, f_p, lo_u, lo_f]

    states = np.stack(chans, axis=-1) / rescaler
    return states.astype(np.float32), shape, shape


@dataclasses.dataclass
class BurgersWaveletDataset:
    """In-memory multi-resolution dataset with SuperDataLoader-style batch
    mixing (reference ``data_burgers_1d.py:243-254``: each batch drawn
    entirely from one random resolution level)."""

    states: List[np.ndarray]  # one array per level
    coef_shapes: List[List[int]]
    ori_shapes: List[List[int]]
    rescaler: np.ndarray

    def iter_batches(self, batch_size: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        n_levels = len(self.states)
        while True:
            lvl = rng.integers(n_levels) if n_levels > 1 else 0
            arr = self.states[lvl]
            idx = rng.integers(arr.shape[0], size=batch_size)
            yield lvl, arr[idx]
