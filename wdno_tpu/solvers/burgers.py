"""JAX finite-difference solver for 1D viscous Burgers with forcing.

TPU-native replacement of the reference GPU solver
(``burgers/ddpm_burgers/generate_burgers.py:104-204``): the semi-implicit
time loop (61,440 steps for the published config) becomes a single
``lax.scan`` compiled once; the sparse scipy difference stencils become
vectorized slicing (mathematically identical on the trajectory: the
reference re-zeroes both padded endpoints every step, so interior updates
reduce to central differences with zero Dirichlet halo).

Also reimplements the random-data distribution (Gaussian-bump initial
conditions and space-time forcing, reference ``:207-275``) used to build the
training set.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

VISC = 0.01  # reference default viscosity (generate_burgers.py:24)


def _interp_linear_1d(x: Array, size: int) -> Array:
    """torch.nn.functional.interpolate(mode='linear', align_corners=False)
    equivalent along the last axis."""
    n = x.shape[-1]
    if n == size:
        return x
    scale = n / size
    coords = (jnp.arange(size) + 0.5) * scale - 0.5
    lo = jnp.clip(jnp.floor(coords), 0, n - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, n - 1)
    w = jnp.clip(coords - lo, 0.0, 1.0)
    return x[..., lo] * (1 - w) + x[..., hi] * w


def burgers_solve(
    u0: Array,
    f: Array,
    visc: float = VISC,
    T: float = 8.0,
    num_t: int = 80,
    dt: float | None = None,
    s: int = 120 * 16,
    output_space_downsample: bool = True,
) -> Array:
    """Simulate Burgers trajectories u_t + u u_x = visc * u_xx + f.

    Args:
      u0: [N, nx0] initial conditions (linearly upsampled to ``s`` interior
        points).
      f: [N, nt_f, nx0] forcing, piecewise-constant in time over
        ``steps/nt_f`` solver steps.
      T: physical end time; steps = ceil(T/dt).
      num_t: number of recorded snapshots (excluding u0).
      s: interior spatial resolution of the solve.

    Returns:
      [N, num_t + 1, nx_out] trajectory including u0 as frame 0, spatially
      downsampled back to ``u0``'s grid when ``output_space_downsample``.

    Matches reference ``burgers_numeric_solve_free`` semantics: recording
    every ``floor(steps/num_t)`` steps, forcing index ``j // f_time``,
    explicit Euler update ``u += dt * (-1/2 d(u^2)/dx + visc d2u/dx2 + f)``
    with zero boundary halo.
    """
    if dt is None:
        # explicit diffusion stability: r = visc*dt/dx^2 = 0.48 at the
        # reference-native (s=1920, dt=1/76800); scale dt quadratically for
        # other grids so r stays fixed.
        dt = 1.0 / 76800 * (1920.0 / s) ** 2
    N, nx0 = u0.shape
    nt_f = f.shape[1]
    sub_s = s // u0.shape[-1]
    u = _interp_linear_1d(u0, s)
    f_hi = _interp_linear_1d(f, s)

    delta_x = 1.0 / (s + 1)
    steps = math.ceil(T / dt)
    record_time = steps // num_t
    f_time = steps // nt_f
    num_rec = steps // record_time

    inv_2dx = 1.0 / (2 * delta_x)
    visc_dx2 = visc / delta_x**2

    def step(u, j):
        # zero Dirichlet halo (the reference re-zeroes padded endpoints
        # every iteration, generate_burgers.py:178-179)
        up = jnp.pad(u, ((0, 0), (1, 1)))
        us = up**2
        transport = (us[:, 2:] - us[:, :-2]) * inv_2dx
        diffusion = (up[:, 2:] - 2.0 * up[:, 1:-1] + up[:, :-2]) * visc_dx2
        f_idx = j // f_time
        u_next = u + dt * (-0.5 * transport + diffusion + f_hi[:, f_idx, :])
        return u_next, ()

    def record_block(u, block):
        # run `record_time` steps then emit one snapshot
        j0 = block * record_time
        u, _ = jax.lax.scan(step, u, j0 + jnp.arange(record_time))
        return u, u

    u_init = u
    _, sol = jax.lax.scan(record_block, u, jnp.arange(num_rec))
    # sol: [num_rec, N, s] -> [N, num_rec, s]
    sol = jnp.moveaxis(sol, 0, 1)
    traj = jnp.concatenate([u_init[:, None, :], sol], axis=1)
    if output_space_downsample:
        return traj[:, :, ::sub_s]
    return traj


def make_data_varying_f(
    rng: jax.Array,
    Nu0: int,
    Nf: int,
    s: int,
    t: int,
    amp_compensate: float = 2.0,
    alpha: float = 1.0,
) -> Tuple[Array, Array]:
    """Random Gaussian-bump u0 and sum-of-separable-Gaussians forcing
    (reference ``generate_burgers.py:207-275``).

    Returns u0 [Nu0, s] and f [Nf, t, s].
    """
    delta_x = 1.0 / (s + 1)
    x = jnp.linspace(delta_x, 1.0 - delta_x, s)
    delta_t = 1.0 / (t + 1)
    ts = jnp.linspace(delta_t, 1.0 - delta_t, t)

    keys = jax.random.split(rng, 8)

    def unif(key, shape, lo, hi):
        return jax.random.uniform(key, shape) * (hi - lo) + lo

    loc1 = unif(keys[0], (Nu0, 1), 0.2, 0.4)
    amp1 = unif(keys[1], (Nu0, 1), 0.0, 2.0)
    sig1 = unif(keys[2], (Nu0, 1), 0.05, 0.15)
    gauss1 = amp1 * jnp.exp(-0.5 * (x[None, :] - loc1) ** 2 / sig1**2)
    loc2 = unif(keys[3], (Nu0, 1), 0.6, 0.8)
    amp2 = unif(keys[4], (Nu0, 1), -2.0, 0.0)
    sig2 = unif(keys[5], (Nu0, 1), 0.05, 0.15)
    gauss2 = amp2 * jnp.exp(-0.5 * (x[None, :] - loc2) ** 2 / sig2**2)
    u0 = gauss1 + gauss2

    def rand_f(key, is_rand_amp: bool):
        k = jax.random.split(key, 6)
        amp = unif(k[0], (Nf, 1, 1), -1.5, 1.5)
        if is_rand_amp:
            amp = amp * jax.random.randint(k[4], (Nf, 1, 1), 0, 2).astype(amp.dtype)
        loc_s = jax.random.uniform(k[1], (Nf, 1, 1))
        sig_s = unif(k[5], (Nf, 1, 1), 0.1, 0.4)
        exp_space = jnp.exp(-0.5 * (x[None, None, :] - loc_s) ** 2 / sig_s**2)
        loc_t = jax.random.uniform(k[2], (Nf, 1, 1))
        sig_t = unif(k[3], (Nf, 1, 1), 0.1, 0.4)
        exp_time = amp_compensate * jnp.exp(-0.5 * (ts[None, :, None] - loc_t) ** 2 / sig_t**2)
        return amp * exp_space * exp_time

    fkeys = jax.random.split(keys[6], 8)
    f = rand_f(fkeys[0], False)
    for i in range(7):
        f = f + rand_f(fkeys[i + 1], True)
    f = f.astype(jnp.float32)
    if alpha != 1.0:
        f = jnp.clip(f * alpha, -10.0, 10.0)
    return u0.astype(jnp.float32), f


def make_data_varying_f_indexed(
    base_key: jax.Array,
    indices: jax.Array,  # [N] global sample indices
    *,
    s: int,
    t: int,
    amp_compensate: float = 2.0,
    alpha: float = 1.0,
) -> Tuple[Array, Array]:
    """Batch-size-invariant sampling: draw ``(u0[k], f[k])`` from
    ``fold_in(base_key, indices[k])``, so a trajectory's identity depends
    only on ``(base_key, global index)`` — never on how generation was
    batched.  This is what makes separately generated datasets at
    different resolutions/batch sizes correspond trajectory-by-trajectory
    (the zero-shot super-resolution eval compares refinements of base-set
    samples against a higher-resolution test set and requires index
    alignment)."""

    def one(i):
        u0, f = make_data_varying_f(
            jax.random.fold_in(base_key, i), 1, 1, s=s, t=t,
            amp_compensate=amp_compensate, alpha=alpha,
        )
        return u0[0], f[0]

    return jax.vmap(one)(indices)
