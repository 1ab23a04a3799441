"""Burgers FD solver tests (tiny configs — 1 CPU core CI)."""

import numpy as np
import jax
import jax.numpy as jnp

from wdno_tpu.solvers.burgers import burgers_solve, make_data_varying_f, _interp_linear_1d


def test_interp_matches_torch_semantics():
    import torch
    import torch.nn.functional as TF

    x = np.random.default_rng(0).standard_normal((3, 40)).astype(np.float32)
    ours = np.asarray(_interp_linear_1d(jnp.asarray(x), 160))
    ref = TF.interpolate(torch.tensor(x)[:, None, :], size=160, mode="linear",
                         align_corners=False)[:, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_zero_force_decays():
    """With f=0 and viscosity, energy must decay monotonically."""
    rng = jax.random.PRNGKey(0)
    u0, _ = make_data_varying_f(rng, 2, 2, s=96, t=8)
    f = jnp.zeros((2, 8, 96))
    traj = burgers_solve(u0, f, T=0.5, num_t=8, dt=1e-4, s=96)
    e = np.asarray((traj**2).sum(-1))
    assert traj.shape == (2, 9, 96)
    assert np.isfinite(e).all()
    assert (np.diff(e, axis=1) < 1e-6).all()


def test_zero_init_zero_force_stays_zero():
    u0 = jnp.zeros((1, 48))
    f = jnp.zeros((1, 4, 48))
    traj = burgers_solve(u0, f, T=0.1, num_t=4, dt=1e-4, s=48)
    assert float(jnp.abs(traj).max()) == 0.0


def test_heat_equation_against_analytic():
    """With tiny amplitude the equation linearizes to the heat equation with
    zero Dirichlet BCs: u(x,t) = eps*sin(pi x) exp(-visc pi^2 t)."""
    s = 127
    dx = 1.0 / (s + 1)
    x = np.linspace(dx, 1 - dx, s)
    eps = 1e-4
    u0 = jnp.asarray(eps * np.sin(np.pi * x))[None]
    f = jnp.zeros((1, 4, s))
    T, visc = 1.0, 0.05
    traj = burgers_solve(u0, f, visc=visc, T=T, num_t=4, dt=1e-4, s=s)
    expected = eps * np.sin(np.pi * x) * np.exp(-visc * np.pi**2 * T)
    got = np.asarray(traj[0, -1])
    np.testing.assert_allclose(got, expected, atol=eps * 2e-2)


def test_forcing_injects_momentum():
    s = 64
    u0 = jnp.zeros((1, s))
    f = jnp.ones((1, 4, s)) * 0.5
    traj = burgers_solve(u0, f, T=0.2, num_t=4, dt=1e-4, s=s)
    # forced flow must move; interior mean is positive
    assert float(traj[0, -1].mean()) > 0.01


def test_datagen_distribution():
    u0, f = make_data_varying_f(jax.random.PRNGKey(1), 64, 64, s=120, t=16)
    u0, f = np.asarray(u0), np.asarray(f)
    assert u0.shape == (64, 120) and f.shape == (64, 16, 120)
    # two bumps: positive on the left half, negative on the right half
    assert u0[:, :60].max() > 0 and u0[:, 60:].min() < 0
    assert np.abs(f).max() < 15
