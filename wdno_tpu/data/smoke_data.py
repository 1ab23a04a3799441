"""Smoke dataset: batched on-device data generation + wavelet states.

Replaces the reference pipeline — per-scene CPU PhiFlow loops fanned out
with ``multiprocessing.Pool`` (``a_gen_train.py:699-832``), offline per-sim
``ptwt`` transforms (``wave_trans_2d.py:61-189``) and per-item
``torch.load`` blobs inside the training hot loop (``data_2d.py:156-221``,
a disk-I/O bottleneck flagged in SURVEY §3.3) — with:

* :func:`generate_smoke_batch`: a whole batch of scenes rolled out in one
  ``lax.scan`` on device (random 4-waypoint boundary control, bucket
  accounting, strided recording, matching ``a_gen_train`` semantics);
* :func:`build_smoke_coef`: 3D/2D/1D DWT coefficient blobs at time- and
  space-downsamplings;
* :func:`build_smoke_states`: fully materialized channels-last training
  states ``[N, 24, 40, 40, 42]`` (``+40`` channels for the super model) —
  loaded once, memory-mapped, no per-item deserialization.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import packing as P
from ..ops import wavelet as W
from ..solvers.smoke.grid import advect_centered
from ..solvers.smoke.scene import SmokeScene
from ..solvers.smoke.sim import compose_control_velocity, divergence_free, with_boundary_conditions

Array = jnp.ndarray

SCENE_LEN = 256
RECORD_SCALE = 8


@functools.lru_cache(maxsize=None)
def _scene_rollout_fn(record_res: int, accuracy: float, max_iterations: int):
    """Jitted 256-frame scene rollout, cached on the static config.

    Built once per (record_res, accuracy, max_iterations): datagen calls
    this in a loop (20k scenes / 32 per batch = 625 calls at the reference
    scale), and a per-call ``jax.jit(lambda ...)`` would re-trace the whole
    scanned rollout every time.  All batch-dependent arrays arrive via the
    ``consts`` pytree so the compiled executable is reused across batches.
    """
    sub = 128 // record_res

    def frame_step(consts, carry, inp):
        vel, dens, dens_zero, outs = carry
        f_idx, is_start, vx, vy = inp
        keys = jax.vmap(lambda k: jax.random.fold_in(k, f_idx))(consts["scene_keys"])
        k1 = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
        k2 = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)

        def pnormal(ks, shape):
            return jax.vmap(lambda k: jax.random.normal(k, shape))(ks)

        # segment-start control: fresh ~N(v, |v|/10) field on strips;
        # otherwise previous velocity + N(0, 0.1) noise on strips
        fresh = jnp.stack(
            [
                vx[:, None, None] + jnp.abs(vx[:, None, None] / 10.0)
                * pnormal(k1, (128, 128)),
                vy[:, None, None] + jnp.abs(vy[:, None, None] / 10.0)
                * pnormal(k2, (128, 128)),
            ],
            axis=-1,
        )
        drift = vel + 0.1 * pnormal(k1, vel.shape[1:])
        control = jnp.where(is_start[:, None, None, None], fresh, drift) * consts["strip"]

        cur = compose_control_velocity(vel, control)
        vel = divergence_free(
            cur, consts["stencil"], consts["vel_mask"], accuracy, max_iterations
        )
        vel = with_boundary_conditions(vel, consts["vel_mask"])
        dens = advect_centered(vel, dens)
        dens_zero = advect_centered(vel, dens_zero)

        # bucket accounting at the recorded (::2) resolution
        arr = jnp.pad(dens_zero[..., 0], ((0, 0), (0, 1), (0, 1)))
        in_bucket = jnp.sum(arr * consts["concat"], axis=(1, 2)) > 0
        add = jnp.einsum("byx,kyx->bk", arr[:, ::2, ::2], consts["smoke_masks"][:, ::2, ::2])
        outs = outs + jnp.where(in_bucket[:, None], add, 0.0)
        dens_zero = jnp.where(
            in_bucket[:, None, None, None],
            dens_zero * consts["set_zero"][None, :, :, None],
            dens_zero,
        )

        total_zero = dens_zero[:, ::2, ::2, 0].sum((1, 2))
        rec = (
            jnp.pad(dens[..., 0], ((0, 0), (0, 1), (0, 1)))[:, ::sub, ::sub],
            vel[:, ::sub, ::sub, :],
            control[:, ::sub, ::sub, :],
            jnp.concatenate([outs, total_zero[:, None]], axis=1),
        )
        return (vel, dens, dens_zero, outs), rec

    def run(consts, init, inputs):
        return jax.lax.scan(functools.partial(frame_step, consts), init, inputs)

    return jax.jit(run)


def sample_waypoints(rng: np.random.Generator, batch: int):
    """Random smoke start + 4 waypoints + per-segment velocities
    (reference ``exp2_target_128`` + ``get_per_vel``)."""
    m = 5
    start_x = rng.integers(16 + 1 + m, 112 - 10 - m, size=batch)
    start_y = rng.integers(16 + 1 + m, 40 - 10 - m, size=batch)
    a = (start_x >= 64 - 10).astype(int)
    def tx():
        lo = np.where(a == 0, 16 + m, 64)
        hi = np.where(a == 0, 64 - 10, 112 - 10 - m)
        return rng.integers(0, 1 << 30, size=batch) % (hi - lo) + lo
    xs = np.stack([start_x, tx(), tx(),
                   rng.integers(50, 80 - 1 - 10, size=batch),
                   rng.integers(64 - 8, 64 + 8 - 10, size=batch)], axis=1)
    ys = np.stack([start_y, np.full(batch, 40), np.full(batch, 50),
                   np.full(batch, 64), np.full(batch, 112)], axis=1)

    seg = np.stack([np.hypot(xs[:, i + 1] - xs[:, i], ys[:, i + 1] - ys[:, i])
                    for i in range(4)], axis=1)
    dist = seg.sum(1)
    v = dist / SCENE_LEN
    vx = v[:, None] * (xs[:, 1:] - xs[:, :-1]) / seg
    vy = v[:, None] * (ys[:, 1:] - ys[:, :-1]) / seg
    scale = rng.uniform(2, 5, size=(batch, 1))
    def real(val):
        return rng.normal(val, np.abs(val / 4))
    vxs = real(scale * vx)
    vys = real(5 * vy)
    intervals = (SCENE_LEN * seg[:, :3] / dist[:, None]).astype(int)
    return xs, ys, vxs, vys, intervals


def _per_frame_schedule(vxs, vys, intervals):
    """Expand segment velocities into per-frame (is_segment_start, vx, vy)."""
    B = vxs.shape[0]
    seg_start = np.zeros((B, SCENE_LEN), bool)
    vx_f = np.zeros((B, SCENE_LEN), np.float32)
    vy_f = np.zeros((B, SCENE_LEN), np.float32)
    for b in range(B):
        starts = [0, intervals[b, 0], intervals[b, 0] + intervals[b, 1],
                  intervals[b, 0] + intervals[b, 1] + intervals[b, 2]]
        for k, s in enumerate(starts):
            if s < SCENE_LEN:
                seg_start[b, s] = True
                vx_f[b, s] = vxs[b, k]
                vy_f[b, s] = vys[b, k]
    return seg_start, vx_f, vy_f


def generate_smoke_batch(
    seed: int,
    batch: int,
    scene: SmokeScene,
    accuracy: float = 1e-8,
    max_iterations: int = 500,
    record_stride: int = RECORD_SCALE,
    record_res: int = 64,
    start: int = 0,
) -> Dict[str, np.ndarray]:
    """Generate ``batch`` scenes in one scanned rollout.

    Defaults produce the training format (33 frames @ 64^2, reference
    ``a_gen_train.py``); ``record_stride=1`` gives the 256-frame control
    test set and ``record_res=128`` the full-resolution simulation test set
    (reference ``a_gen_test_64.py`` / ``a_gen_test_128.py``).

    Scene ``j`` of the call is fully determined by ``(seed, start + j)``
    — its waypoints, control noise, and rollout never depend on how
    generation was batched, so regenerating a dataset with a larger ``n``
    or different ``--batch`` reproduces existing scenes exactly (same
    contract as the Burgers ``make_data_varying_f_indexed``).

    Returns Density [B, F, r, r], Velocity [B, F, r, r, 2],
    Control [B, F, r, r, 2], Smoke [B, F, 8] with F = 256/record_stride + 1.
    """
    per_scene = [
        sample_waypoints(np.random.default_rng((seed, g)), 1)
        for g in range(start, start + batch)
    ]
    xs, ys, vxs, vys, intervals = (
        np.concatenate([p[k] for p in per_scene]) for k in range(5)
    )
    seg_start, vx_f, vy_f = _per_frame_schedule(vxs, vys, intervals)

    density0 = np.zeros((batch, 127, 127, 1), np.float32)
    for b in range(batch):
        density0[b, ys[b, 0] : ys[b, 0] + 11, xs[b, 0] : xs[b, 0] + 11, 0] = 1.0

    stencil = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(jnp.asarray(a), (batch,) + a.shape[1:]), scene.stencil
    )
    vel_mask = jnp.asarray(scene.velocity_mask)
    smoke_masks = jnp.asarray(scene.smoke_masks)
    concat = jnp.asarray(scene.smoke_concat)
    set_zero = jnp.asarray(scene.set_zero[:-1, :-1])

    strip = np.ones((128, 128), np.float32)
    strip[16:112, 16:112] = 0.0
    strip = jnp.asarray(strip)[None, :, :, None]

    # one key per scene, derived from the scene's global index; frame noise
    # folds in the frame index so scene content is batching-invariant
    scene_keys = jax.vmap(
        lambda g: jax.random.fold_in(jax.random.PRNGKey(seed), g)
    )(jnp.arange(start, start + batch))

    consts = {
        "scene_keys": scene_keys,
        "stencil": stencil,
        "vel_mask": vel_mask,
        "smoke_masks": smoke_masks,
        "concat": concat,
        "set_zero": set_zero,
        "strip": strip,
    }

    vel0 = jnp.zeros((batch, 128, 128, 2), jnp.float32).at[..., 1].set(0.2)
    init = (vel0, jnp.asarray(density0), jnp.asarray(density0),
            jnp.zeros((batch, scene.smoke_masks.shape[0])))

    inputs = (
        jnp.arange(SCENE_LEN),
        jnp.asarray(seg_start.T),  # scan over time-first
        jnp.asarray(vx_f.T),
        jnp.asarray(vy_f.T),
    )
    rollout = _scene_rollout_fn(record_res, float(accuracy), int(max_iterations))
    (_, dens_T, _, _), (d_seq, v_seq, c_seq, s_seq) = rollout(consts, init, inputs)

    # recorded frames: initial state + every record_stride-th frame
    idx = np.arange(record_stride - 1, SCENE_LEN, record_stride)
    sub = 128 // record_res
    r = record_res
    d0 = np.pad(np.asarray(density0[..., 0]), ((0, 0), (0, 1), (0, 1)))[:, ::sub, ::sub]
    dens = np.concatenate([d0[:, None], np.moveaxis(np.asarray(d_seq[idx]), 1, 0)], axis=1)
    vel = np.concatenate(
        [np.zeros((batch, 1, r, r, 2), np.float32), np.moveaxis(np.asarray(v_seq[idx]), 1, 0)],
        axis=1,
    )
    ctrl = np.concatenate(
        [np.zeros((batch, 1, r, r, 2), np.float32), np.moveaxis(np.asarray(c_seq[idx]), 1, 0)],
        axis=1,
    )
    smoke0 = np.zeros((batch, 1, scene.smoke_masks.shape[0] + 1), np.float32)
    smoke0[:, 0, -1] = d0.sum((1, 2))
    smoke = np.concatenate([smoke0, np.moveaxis(np.asarray(s_seq[idx]), 1, 0)], axis=1)
    return {"Density": dens, "Velocity": vel, "Control": ctrl, "Smoke": smoke}


def build_smoke_raw_states(
    fields: Dict[str, np.ndarray],
    *,
    num_frames: int = 32,
    rescaler: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Raw (non-wavelet) training states [N, F, H, W, 6]: channels
    (d, v1, v2, c1, c2, smoke-out ratio), per-channel rescaled — the
    ``Smoke`` dataset equivalent (reference ``data_2d.py:58-77``)."""
    from .rescalers import smoke_raw_rescaler

    d = fields["Density"][:, :num_frames]
    v = fields["Velocity"][:, :num_frames]
    c = fields["Control"][:, :num_frames]
    s = fields["Smoke"][:, :num_frames]
    s_ratio = s[:, :, 1] / s.sum(-1)
    s_img = np.broadcast_to(s_ratio[:, :, None, None], d.shape)
    state = np.stack([d, v[..., 0], v[..., 1], c[..., 0], c[..., 1], s_img], axis=-1)
    if rescaler is None:
        rescaler = smoke_raw_rescaler()
    return (state / rescaler.reshape(1, 1, 1, 1, -1)).astype(np.float32)


# ---------------------------------------------------------------------------
# Wavelet coefficient prep (wave_trans_2d equivalent)
# ---------------------------------------------------------------------------


def build_smoke_coef(
    fields: Dict[str, np.ndarray],
    *,
    wave_type: str = "bior1.3",
    pad_mode: str = "zero",
    n_downsample: int = 3,
    downsample_type: str = "time",
    num_frames: int = 32,
    batch: int = 64,
    levels: Optional[Sequence[int]] = None,
) -> Dict:
    """Per-level packed coefficient blobs for a batch of sims.

    X = [d, v1, v2, c1, c2] over the first ``num_frames`` recorded frames;
    per level i the reference downsamples time (``X[:, ::2**i]``) or space
    and takes a level-1 3D DWT; also the 2D DWT of the initial density and
    the 1D DWT of the smoke-out ratio (``wave_trans_2d.py:126-159``).

    ``levels`` selects specific downsample exponents (default
    ``range(n_downsample)``): the super-model prep computes only levels
    1..n when a level-0 blob already exists on disk — recomputing (or even
    rewriting) the 33 GB level-0 member would need more free disk than the
    reference-budget host has.

    Returns {"coef": [N, nt', nx', nx', 40] per level, "init": [N, nx',
    nx', 4] per level, "smokeout": [N, ns', 2] per level, "shape",
    "ori_shape", "levels"} — lists positional, aligned with ``levels``.
    """
    d = fields["Density"]
    v = fields["Velocity"]
    c = fields["Control"]
    s = fields["Smoke"][:, :num_frames]
    s_ratio = (s[:, :, 1] / s.sum(-1)).astype(np.float32)
    N = d.shape[0]

    dwt3 = jax.jit(lambda x: P.pack3d(*W.dwt3d(x, wave_type, pad_mode)))
    dwt2 = jax.jit(lambda x: P.pack2d(*W.dwt2d(x, wave_type, pad_mode)))
    dwt1 = jax.jit(lambda x: jnp.stack(W.dwt1d(x, wave_type, pad_mode), axis=-1))

    # Stream per-sim chunks straight into preallocated per-level outputs.
    # The concatenating version held the full [N,5,F,H,W] stack plus every
    # per-batch coefficient slice in Python lists — for the 10k-scene
    # reference-budget train split that peaked well past host RAM and was
    # OOM-killed; this version's peak is fields + the output arrays.
    if levels is None:
        levels = list(range(n_downsample))
    out = {"coef": [], "init": [], "smokeout": [], "shape": [], "ori_shape": [],
           "levels": list(levels)}
    for pos, i in enumerate(levels):
        for j in range(0, N, batch):
            sl = slice(j, min(j + batch, N))
            X = np.stack(
                [
                    d[sl, :num_frames],
                    v[sl, :num_frames, ..., 0],
                    v[sl, :num_frames, ..., 1],
                    c[sl, :num_frames, ..., 0],
                    c[sl, :num_frames, ..., 1],
                ],
                axis=1,
            ).astype(np.float32)  # [b, 5, F, H, W]
            if downsample_type == "time":
                Xs = X[:, :, :: 2**i]
                ss = s_ratio[sl, :: 2**i]
            else:
                Xs = X[:, :, :, :: 2**i, :: 2**i]
                ss = s_ratio[sl]
            chunk = jnp.asarray(Xs)
            packed = np.asarray(dwt3(chunk))  # [b, 5, ft, fh, fw, 8]
            cj = np.ascontiguousarray(
                packed.transpose(0, 2, 3, 4, 1, 5)
            ).reshape(packed.shape[0], *packed.shape[2:5], 40)
            ij = np.asarray(dwt2(chunk[:, 0, 0]))  # [b, h', w', 4]
            sj = np.asarray(dwt1(jnp.asarray(ss)))  # [b, ns', 2]
            if j == 0:
                out["coef"].append(
                    np.empty((N,) + cj.shape[1:], np.float32))
                out["init"].append(
                    np.empty((N,) + ij.shape[1:], np.float32))
                out["smokeout"].append(
                    np.empty((N,) + sj.shape[1:], np.float32))
                out["shape"].append(list(cj.shape[1:4]))
                out["ori_shape"].append(list(Xs.shape[2:]))
            out["coef"][pos][sl] = cj
            out["init"][pos][sl] = ij
            out["smokeout"][pos][sl] = sj
    return out


def smoke_states_transform(rescaler: np.ndarray, pad_t: int = 24, pad_x: int = 40):
    """Jittable per-batch states builder — the streaming twin of
    :func:`build_smoke_states` (base model, one level).

    ``fn(w, gids, init, sm)`` maps gathered level coefficients
    ``w [B, nt, nx, nx, 40]`` plus per-scene conditioning rows (gathered by
    the reservoir from its device-resident tables) to padded 42-channel
    states ``[B, pad_t, pad_x, pad_x, 42]``, entirely on device.
    Numerically identical to the materialized path (asserted in tests);
    exists so the 10k-scene reference-budget split never needs a
    dataset-sized states cache on disk or a per-step host transfer
    (reference ``data_2d.py:156-221`` rebuilds the same thing per item on
    the host).
    """
    r = jnp.asarray(np.asarray(rescaler).reshape(1, 1, 1, 1, -1))
    n_rep = pad_t // 4

    def fn(w: Array, gids: Array, init: Array, sm: Array) -> Array:
        del gids  # conditioning rows arrive pre-gathered
        n = w.shape[0]
        data = P.pad_to(w, (pad_t, pad_x, pad_x), axes=(1, 2, 3))
        cond = jnp.repeat(jnp.moveaxis(init, 3, 1), n_rep, axis=1)  # [n,4T,..]
        cond = P.pad_to(cond, (pad_x, pad_x), axes=(2, 3))[..., None]
        ns = sm.shape[1]
        half = pad_x // 2
        top = jnp.broadcast_to(sm[:, :, 0][:, :, None, None], (n, ns, half, pad_x))
        bot = jnp.broadcast_to(sm[:, :, 1][:, :, None, None], (n, ns, half, pad_x))
        sm_img = jnp.concatenate([top, bot], axis=2)
        sm_img = P.pad_to(sm_img, (pad_t,), axes=(1,))[..., None]
        return jnp.concatenate([data, cond, sm_img], axis=-1) / r

    return fn


def smoke_super_states_transform(rescaler: np.ndarray, level: int,
                                 downsample_type: str = "space"):
    """Jittable 82-channel SUPER states builder — the streaming twin of
    :func:`build_smoke_states` with ``is_super_model=True`` (asserted
    bit-equal in tests).

    ``fn(w, w_sub, gids, init, sm)`` maps aligned gathers of level-``level``
    coefficients ``w [B, nt, nx, nx, 40]``, level-``level+1`` coefficients
    ``w_sub`` (the refinement condition), and the per-scene conditioning
    rows to padded states ``[B, pad_t, pad_x, pad_x, 82]`` entirely on
    device — the materialized path writes ~16 MB/scene/level of states
    caches to disk (31 GB at maxn=2000; 157 GB for the full split), which
    the reference-budget host does not have.
    """
    if downsample_type == "time":
        pad_t, pad_x = 24 // 2 ** level, 40
    else:
        pad_t, pad_x = 24, 40 // 2 ** level
    r = jnp.asarray(np.asarray(rescaler).reshape(1, 1, 1, 1, -1))
    n_rep = pad_t // 4

    def fn(w: Array, w_sub: Array, gids: Array, init: Array, sm: Array) -> Array:
        del gids
        n = w.shape[0]
        if downsample_type == "space":
            low = P.upsample_coef3d(w_sub, "space", axes=(1, 2, 3))
            cur = jnp.pad(w, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        else:
            low = P.upsample_coef3d(w_sub, "time", axes=(1, 2, 3))
            cur = jnp.concatenate([w[:, :1], w, w[:, -1:]], axis=1)
        data = jnp.concatenate([cur, low], axis=-1)
        data = P.pad_to(data, (pad_t, pad_x, pad_x), axes=(1, 2, 3))
        cond = jnp.repeat(jnp.moveaxis(init, 3, 1), n_rep, axis=1)
        cond = P.pad_to(cond, (pad_x, pad_x), axes=(2, 3))[..., None]
        ns = sm.shape[1]
        half = pad_x // 2
        top = jnp.broadcast_to(sm[:, :, 0][:, :, None, None], (n, ns, half, pad_x))
        bot = jnp.broadcast_to(sm[:, :, 1][:, :, None, None], (n, ns, half, pad_x))
        sm_img = jnp.concatenate([top, bot], axis=2)
        sm_img = P.pad_to(sm_img, (pad_t,), axes=(1,))[..., None]
        return jnp.concatenate([data, cond, sm_img], axis=-1) / r

    return fn


def make_streaming_smoke_super_loader(
    sources: Dict[int, Tuple[str, int]],
    level: int,
    batch_size: int,
    *,
    rescaler: np.ndarray,
    downsample_type: str = "space",
    seed: int = 0,
    max_items: Optional[int] = None,
    **reservoir_kw,
):
    """Streaming reservoir loader for one SUPER training level.

    ``sources`` maps absolute coefficient level -> ``(npz_path, position)``
    (the two-file layout: level 0 in the 33 GB streaming blob, levels 1+
    in the supplemental ``_lvlA-B`` npz).  The reservoir holds ALIGNED
    slabs of level ``level`` and ``level+1`` coefficients (same scene ids,
    refreshed together) plus device-resident init/smoke-out tables, and
    builds 82-channel states in the jitted gather.
    """
    from .loader import ReservoirLoader, npz_member_memmap

    def member(lvl, name):
        path, pos = sources[lvl]
        try:
            return npz_member_memmap(path, f"{name}_{pos}")
        except ValueError:
            return np.load(path)[f"{name}_{pos}"]

    w = member(level, "coef")
    w_sub = member(level + 1, "coef")
    init_all = np.asarray(member(level, "init"))
    sm_all = np.asarray(member(level, "smokeout"))
    if max_items:
        w, w_sub = w[:max_items], w_sub[:max_items]
        init_all, sm_all = init_all[:max_items], sm_all[:max_items]
    fn = smoke_super_states_transform(rescaler, level, downsample_type)
    return ReservoirLoader(
        (w, w_sub), batch_size, transform=fn, aux=(init_all, sm_all),
        seed=seed, **reservoir_kw,
    )


def make_streaming_smoke_loader(
    coef_path: str,
    batch_size: int,
    *,
    rescaler: np.ndarray,
    level: int = 0,
    seed: int = 0,
    max_items: Optional[int] = None,
    **reservoir_kw,
):
    """Streaming reservoir loader over one level of a smoke coef ``.npz``.

    Memory-maps the (uncompressed) coefficient member in place and keeps
    the small per-scene conditioning tables fully device-resident; returns
    a :class:`~wdno_tpu.data.loader.ReservoirLoader` yielding on-device
    state batches.  Base model only (one level, no super channels).
    """
    from .loader import ReservoirLoader, npz_member_memmap

    if level != 0:
        raise ValueError("streaming smoke loader supports the base level only")
    w = npz_member_memmap(coef_path, f"coef_{level}")
    init_all = np.asarray(npz_member_memmap(coef_path, f"init_{level}"))
    sm_all = np.asarray(npz_member_memmap(coef_path, f"smokeout_{level}"))
    if max_items:
        w = w[:max_items]
        init_all = init_all[:max_items]
        sm_all = sm_all[:max_items]
    fn = smoke_states_transform(rescaler)
    return ReservoirLoader(
        w, batch_size, transform=fn, aux=(init_all, sm_all), seed=seed,
        **reservoir_kw,
    )


def build_smoke_states(
    db: Dict,
    *,
    level: int = 0,
    is_super_model: bool = False,
    downsample_type: str = "time",
    rescaler: Optional[np.ndarray] = None,
    chunk: int = 128,
) -> Tuple[np.ndarray, List[int], List[int]]:
    """Materialize padded training states (``Smoke_wave.__getitem__``
    equivalent, reference ``data_2d.py:156-221``).

    Returns (states [N, pad_t, pad_x, pad_x, C], coef_shape, ori_shape)
    with C = 42 (82 super): 40 field bands + init-density DWT channel +
    smoke-out channel.  Built ``chunk`` sims at a time directly into the
    preallocated output: the whole-dataset version materialized several
    dataset-sized intermediates (pad/concat/divide), peaking at ~4x the
    output size in host RSS for a 1.4k-scene set.
    """
    from .rescalers import smoke_wavelet_rescaler

    w_all = db["coef"][level]  # [N, nt, nx, nx, 40]
    N = w_all.shape[0]
    shape = list(w_all.shape[1:4])
    ori_shape = list(db["ori_shape"][level])

    if is_super_model and level + 1 >= len(db["coef"]):
        raise ValueError(
            f"super model at level {level} needs coefficients at level "
            f"{level + 1}, but the database has only {len(db['coef'])} "
            "levels — prep with a larger --n_downsample or train the super "
            "model on levels 0..n_downsample-2"
        )
    if downsample_type == "time":
        pad_t, pad_x = 24 // 2**level, 40
    else:
        pad_t, pad_x = 24, 40 // 2**level
    if pad_t % 4:
        raise ValueError(
            f"time level {level} gives pad_t={pad_t}, not divisible by the "
            "4 repeated condition-channel blocks (reference supports two "
            "time downsamplings of the 24-frame padded state)"
        )

    if rescaler is None:
        rescaler = smoke_wavelet_rescaler(is_super_model=is_super_model)
    C = (80 if is_super_model else 40) + 2
    states = np.empty((N, pad_t, pad_x, pad_x, C), np.float32)
    r = np.asarray(rescaler).reshape(1, 1, 1, 1, -1)

    for i0 in range(0, N, chunk):
        sl = slice(i0, min(i0 + chunk, N))
        w = jnp.asarray(w_all[sl])
        n = w.shape[0]
        if not is_super_model:
            data = P.pad_to(w, (pad_t, pad_x, pad_x), axes=(1, 2, 3))
        else:
            w_sub = jnp.asarray(db["coef"][level + 1][sl])
            if downsample_type == "space":
                low = P.upsample_coef3d(w_sub, "space", axes=(1, 2, 3))
                # boundary-replicate current coefficients by 1 cell
                cur = jnp.pad(
                    w, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"
                )
            else:
                low = P.upsample_coef3d(w_sub, "time", axes=(1, 2, 3))
                cur = jnp.concatenate([w[:, :1], w, w[:, -1:]], axis=1)
            assert cur.shape == low.shape, (cur.shape, low.shape)
            data = jnp.concatenate([cur, low], axis=-1)
            data = P.pad_to(data, (pad_t, pad_x, pad_x), axes=(1, 2, 3))

        # init-density condition: 4 DWT bands each repeated pad_t/4 frames
        init = db["init"][level][sl]  # [n, nxc, nxc, 4]
        n_rep = pad_t // 4
        cond = np.repeat(np.moveaxis(init, 3, 1), n_rep, axis=1)
        cond = P.pad_to(jnp.asarray(cond), (pad_x, pad_x), axes=(2, 3))[..., None]

        # smoke-out: per frame, top half rows = approx coef, bottom = detail
        sm = db["smokeout"][level][sl]  # [n, ns, 2]
        ns = sm.shape[1]
        half = pad_x // 2
        top = np.broadcast_to(sm[:, :, 0][:, :, None, None], (n, ns, half, pad_x))
        bot = np.broadcast_to(sm[:, :, 1][:, :, None, None], (n, ns, half, pad_x))
        sm_img = np.concatenate([top, bot], axis=2)
        sm_img = np.asarray(P.pad_to(jnp.asarray(sm_img), (pad_t,), axes=(1,)))[..., None]

        out = np.concatenate([np.asarray(data), np.asarray(cond), sm_img], axis=-1)
        states[sl] = out / r
    return states, shape, ori_shape
