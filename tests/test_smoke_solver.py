"""Smoke solver tests: stencil vs dense oracle, CG convergence + VJP,
staggered-grid identities, projection, and a short scene rollout."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wdno_tpu.solvers.smoke.grid import (
    advect_centered,
    at_centers,
    bilinear_resample,
    divergence,
    pressure_gradient,
    staggered_velocity_mask,
)
from wdno_tpu.solvers.smoke.pressure import (
    apply_laplace,
    build_stencil,
    conjugate_gradient,
    solve_pressure_cg,
)
from wdno_tpu.solvers.smoke.scene import make_scene
from wdno_tpu.solvers.smoke.sim import divergence_free


def _dense_laplace_oracle(active, fluid):
    """Independent dense construction: for each cell i, neighbour coeff =
    active[nb]*active[i]; center = min(-(sum of fluid neighbours), -1).
    Masks given WITHOUT padding; closed boundary = zero-padded."""
    n, m = active.shape
    a = np.pad(active, 1)
    fl = np.pad(fluid, 1)
    N = n * m
    A = np.zeros((N, N))
    for y in range(n):
        for x in range(m):
            i = y * m + x
            cy, cx = y + 1, x + 1
            center = -(fl[cy + 1, cx] + fl[cy - 1, cx] + fl[cy, cx + 1] + fl[cy, cx - 1])
            A[i, i] = min(center, -1)
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                yy, xx = y + dy, x + dx
                if 0 <= yy < n and 0 <= xx < m:
                    A[i, yy * m + xx] = a[cy + dy, cx + dx] * a[cy, cx]
    return A


def test_stencil_matches_dense_oracle():
    rng = np.random.default_rng(0)
    n = 6
    fluid = (rng.random((n, n)) > 0.3).astype(np.float32)
    active = fluid.copy()
    A = _dense_laplace_oracle(active, fluid)
    st = build_stencil(
        jnp.asarray(np.pad(active, 1)[None, :, :, None]),
        jnp.asarray(np.pad(fluid, 1)[None, :, :, None]),
    )
    p = rng.standard_normal((1, n, n)).astype(np.float32)
    ours = np.asarray(apply_laplace(st, jnp.asarray(p)))[0].ravel()
    ref = A @ p.ravel()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_cg_solves_system():
    rng = np.random.default_rng(1)
    n = 16
    fluid = np.ones((n, n), np.float32)
    st = build_stencil(
        jnp.asarray(np.pad(fluid, 1)[None, :, :, None]),
        jnp.asarray(np.pad(fluid, 1)[None, :, :, None]),
    )
    b = rng.standard_normal((2, n, n)).astype(np.float32)
    # the closed-domain Neumann Laplacian is singular with a per-sample
    # constant nullspace: RHS must be zero-mean PER SAMPLE to be consistent
    b = b - b.mean(axis=(1, 2), keepdims=True)
    st_b = jax.tree_util.tree_map(lambda c: jnp.broadcast_to(c, (2, n, n)), st)
    x, iters = conjugate_gradient(jnp.asarray(b), st_b, accuracy=1e-5, max_iterations=400)
    res = np.asarray(apply_laplace(st_b, x)) - b
    assert np.abs(res).max() < 1e-4
    assert int(iters) < 400


def test_cg_custom_vjp():
    n = 8
    fluid = np.ones((n, n), np.float32)
    # open-boundary padding (fluid padded with ones) makes the Laplacian
    # strictly diagonally dominant -> nonsingular, so the VJP check is exact
    st = build_stencil(
        jnp.asarray(np.pad(fluid, 1)[None, :, :, None]),
        jnp.asarray(np.pad(fluid, 1, constant_values=1)[None, :, :, None]),
    )
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((1, n, n, 1)).astype(np.float32))

    def f(b_):
        p = solve_pressure_cg(b_, st, 1e-8, 500)
        return jnp.sum(p**2)

    g = jax.grad(f)(b)
    # numerical check on a few coordinates
    eps = 1e-3
    for (y, x) in [(2, 3), (5, 5)]:
        db = b.at[0, y, x, 0].add(eps)
        db2 = b.at[0, y, x, 0].add(-eps)
        num = (f(db) - f(db2)) / (2 * eps)
        assert abs(float(g[0, y, x, 0]) - float(num)) < 2e-2 * max(1.0, abs(float(num)))


def test_divergence_and_gradient_adjointness():
    """div and (negative) staggered gradient are adjoint up to boundary terms
    on interior-supported fields."""
    rng = np.random.default_rng(3)
    p = np.zeros((1, 8, 8, 1), np.float32)
    p[0, 2:6, 2:6, 0] = rng.standard_normal((4, 4))
    v = np.zeros((1, 9, 9, 2), np.float32)
    v[0, 2:6, 2:6, :] = rng.standard_normal((4, 4, 2))
    lhs = float((np.asarray(divergence(jnp.asarray(v)))[..., 0] * p[..., 0]).sum())
    rhs = -float((np.asarray(pressure_gradient(jnp.asarray(p))) * v).sum())
    assert abs(lhs - rhs) < 1e-4


def test_bilinear_resample_identity_and_shift():
    rng = np.random.default_rng(4)
    f = jnp.asarray(rng.standard_normal((1, 8, 8, 1)).astype(np.float32))
    yy, xx = jnp.meshgrid(jnp.arange(8.0), jnp.arange(8.0), indexing="ij")
    coords = jnp.stack([yy, xx], -1)[None]
    np.testing.assert_allclose(np.asarray(bilinear_resample(f, coords)), np.asarray(f), atol=1e-6)
    half = coords + 0.5
    out = np.asarray(bilinear_resample(f, half))[0, :7, :7, 0]
    e = np.asarray(f)[0, :, :, 0]
    avg = (e[:-1, :-1] + e[:-1, 1:] + e[1:, :-1] + e[1:, 1:]) / 4
    np.testing.assert_allclose(out, avg, atol=1e-5)


def test_advect_uniform_velocity_shifts():
    f = np.zeros((1, 16, 16, 1), np.float32)
    f[0, 8, 8, 0] = 1.0
    stag = np.zeros((1, 17, 17, 2), np.float32)
    stag[..., 0] = 2.0  # vx = 2
    out = np.asarray(advect_centered(jnp.asarray(stag), jnp.asarray(f), dt=1.0))
    # semi-Lagrangian backtrace: out[y, x] = f[y, x - vx] -> peak moves to x=10
    assert out[0, 8, 10, 0] > 0.9
    assert out[0, 8, 8, 0] < 0.1


def test_scene_masks():
    sc = make_scene()
    assert sc.fluid_mask.shape == (1, 127, 127, 1)
    assert sc.velocity_mask.shape == (1, 128, 128, 2)
    # obstacles zero out fluid
    assert sc.fluid_mask[0, 16, 50, 0] == 0  # bottom wall
    assert sc.fluid_mask[0, 100, 64, 0] == 1  # open interior
    # closed domain: boundary faces masked
    assert sc.velocity_mask[0, 0, 50, 1] == 0
    assert (sc.smoke_masks.sum(0) <= 1.0 + 1e-6).all()


def test_divergence_free_projection():
    sc = make_scene()
    rng = np.random.default_rng(5)
    vel = jnp.asarray(rng.standard_normal((1, 128, 128, 2)).astype(np.float32) * 0.1)
    st = jax.tree_util.tree_map(jnp.asarray, sc.stencil)
    out = divergence_free(vel, st, jnp.asarray(sc.velocity_mask), accuracy=1e-6, max_iterations=800)
    div = np.asarray(divergence(out))[0, :, :, 0]
    active = sc.active_mask[0, :, :, 0]
    # interior active cells (exclude cells adjacent to obstacles where the
    # masked projection leaves residual divergence by design)
    import scipy.ndimage as ndi

    eroded = ndi.binary_erosion(active > 0, iterations=2)
    assert np.abs(div[eroded]).max() < 5e-3


def test_pallas_stencil_matches_xla():
    from wdno_tpu.solvers.smoke.pressure_pallas import apply_laplace_fused

    rng = np.random.default_rng(7)
    n = 16
    fluid = (rng.random((n, n)) > 0.2).astype(np.float32)
    st = build_stencil(
        jnp.asarray(np.pad(fluid, 1)[None, :, :, None]),
        jnp.asarray(np.pad(fluid, 1)[None, :, :, None]),
    )
    st_b = jax.tree_util.tree_map(lambda c: jnp.broadcast_to(c, (3, n, n)), st)
    p = jnp.asarray(rng.standard_normal((3, n, n)).astype(np.float32))
    ref = np.asarray(apply_laplace(st_b, p))
    out = np.asarray(apply_laplace_fused(st_b, p))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_advect_mac_constant_field_invariant():
    """MAC self-advection of a spatially constant staggered field is the
    identity away from the inflow boundary (reference ``nd.py:429-444``)."""
    from wdno_tpu.solvers.smoke.grid import advect_mac

    vel = jnp.zeros((1, 17, 17, 2)).at[..., 0].set(0.3).at[..., 1].set(-0.2)
    out = np.asarray(advect_mac(vel, vel, dt=1.0))
    # interior: constant field advected by constant velocity stays constant
    np.testing.assert_allclose(out[0, 2:-2, 2:-2, 0], 0.3, atol=1e-6)
    np.testing.assert_allclose(out[0, 2:-2, 2:-2, 1], -0.2, atol=1e-6)


def test_advect_mac_translates_bump():
    """A bump in the advected x-component moves along +x under uniform
    +x velocity (semi-Lagrangian backtrace)."""
    from wdno_tpu.solvers.smoke.grid import advect_mac

    n = 33
    vel = jnp.zeros((1, n, n, 2)).at[..., 0].set(1.0)
    field = jnp.zeros((1, n, n, 2)).at[:, 16, 10, 0].set(1.0)
    out = np.asarray(advect_mac(vel, field, dt=2.0))
    assert out[0, 16, 12, 0] > 0.9  # bump moved 2 cells in +x
    assert out[0, 16, 10, 0] < 0.1


def test_cg_pallas_wiring_matches_xla(monkeypatch):
    """conjugate_gradient with the Pallas stencil apply (WDNO_PALLAS_CG=1,
    interpret mode on CPU) solves to the same pressure as the XLA path —
    validates the production wiring, not just the kernel in isolation."""
    from wdno_tpu.solvers.smoke import pressure as P

    rng = np.random.default_rng(7)
    B, H, W = 2, 24, 24
    active = np.ones((B, H + 2, W + 2, 1), np.float32)
    active[:, 9:13, 9:13] = 0.0  # an obstacle
    fluid = active.copy()
    st = P.build_stencil(jnp.asarray(active), jnp.asarray(fluid))
    div = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    div = div * np.asarray(active[:, 1:-1, 1:-1, 0])

    monkeypatch.setenv("WDNO_PALLAS_CG", "0")
    x_xla, it_xla = jax.jit(P.conjugate_gradient, static_argnums=(2, 3))(div, st, 1e-6, 500)
    monkeypatch.setenv("WDNO_PALLAS_CG", "1")
    x_pl, it_pl = jax.jit(P.conjugate_gradient, static_argnums=(2, 3))(div, st, 1e-6, 500)

    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_xla), rtol=2e-4, atol=2e-5)
    resid = np.asarray(P.apply_laplace(st, x_pl)) - np.asarray(div)
    assert np.max(np.abs(resid)) < 5e-5
