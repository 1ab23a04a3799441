"""Masked-Laplacian conjugate-gradient pressure projection.

TPU-native replacement of the reference's pressure-solver family — SciPy
sparse CG (``phi/solver/sparse.py:82-128``), generic CG loop
(``phi/solver/base.py:56-103``) and the CUDA custom op
(``phi/solver/cuda/src/pressure_solve_op.cu.cc``): the obstacle-aware
5-point Laplacian is applied as a dense stencil (shifts + multiplies fused
by XLA onto the VPU — no sparse matrix materialization), the CG loop is a
``lax.while_loop``, and the gradient is the classic CG-on-cotangent
``custom_vjp`` (reference ``sparse.py:103-112``, ``cuda/cuda.py:18-23``; A
is symmetric).

Stencil coefficient construction mirrors ``sparse_pressure_matrix``
(``sparse.py:27-78``) with 2-cell-extended active/fluid masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


class LaplaceStencil(NamedTuple):
    """Dense per-cell stencil coefficients over [B, H, W]."""

    center: Array
    up_y: Array  # coefficient multiplying p[y+1, x]
    down_y: Array  # p[y-1, x]
    up_x: Array  # p[y, x+1]
    down_x: Array  # p[y, x-1]


def build_stencil(active_ext: Array, fluid_ext: Array) -> LaplaceStencil:
    """Build masked-Laplacian coefficients from masks extended by one cell on
    every side: masks [B, H+2, W+2, 1] -> stencil over [B, H, W].

    Follows ``sparse_pressure_matrix`` (reference ``sparse.py:46-77``):
    neighbour coefficient = active[nb] * active[center]; center = clip(
    -sum(fluid[nb]), max=-1).
    """
    a = active_ext[..., 0]
    f = fluid_ext[..., 0]
    ac = a[:, 1:-1, 1:-1]
    up_y = a[:, 2:, 1:-1] * ac
    down_y = a[:, :-2, 1:-1] * ac
    up_x = a[:, 1:-1, 2:] * ac
    down_x = a[:, 1:-1, :-2] * ac
    center = -(
        f[:, 2:, 1:-1] + f[:, :-2, 1:-1] + f[:, 1:-1, 2:] + f[:, 1:-1, :-2]
    )
    center = jnp.minimum(center, -1.0)
    return LaplaceStencil(center, up_y, down_y, up_x, down_x)


def apply_laplace(st: LaplaceStencil, p: Array) -> Array:
    """(A p) over [B, H, W]; out-of-range neighbours are dropped (the sparse
    matrix simply has no entry there)."""
    out = st.center * p
    out = out + st.up_y * jnp.pad(p[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
    out = out + st.down_y * jnp.pad(p[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
    out = out + st.up_x * jnp.pad(p[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
    out = out + st.down_x * jnp.pad(p[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
    return out


def _laplace_impl():
    """The stencil apply used by the CG loop: the fused Pallas kernel on TPU
    (one VMEM pass per batch element, the TPU equivalent of the reference
    CUDA ``calcZ_v4`` SpMV), XLA shifts+multiplies elsewhere.
    ``WDNO_PALLAS_CG=0`` forces XLA; ``=1`` forces the Pallas kernel even
    off-TPU (interpret mode — used by the wiring tests)."""
    import os

    pol = os.environ.get("WDNO_PALLAS_CG", "auto")
    if pol == "1" or (pol != "0" and jax.default_backend() == "tpu"):
        from .pressure_pallas import apply_laplace_fused

        return apply_laplace_fused
    return apply_laplace


def conjugate_gradient(
    k: Array,
    st: LaplaceStencil,
    accuracy: float = 1e-5,
    max_iterations: int = 500,
) -> Tuple[Array, Array]:
    """Batched CG solving A x = k over [B, H, W] fields.

    Same recurrence as the reference (``solver/base.py:56-103``, NIST form
    with the shared denominator); terminates when max|residual| < accuracy
    across the whole batch or at ``max_iterations``.
    """
    apply_laplace_ = _laplace_impl()
    x0 = jnp.zeros_like(k)
    momentum = k
    residual = k
    lap_mom = apply_laplace_(st, momentum)

    def cond(state):
        _, _, _, residual, i = state
        return jnp.logical_and(
            jnp.max(jnp.abs(residual)) >= accuracy, i < max_iterations
        )

    def body(state):
        x, momentum, lap_mom, residual, i = state
        tmp = jnp.sum(momentum * lap_mom)
        a = jnp.sum(momentum * residual) / tmp
        x = x + a * momentum
        residual = residual - a * lap_mom
        b = -jnp.sum(residual * lap_mom) / tmp
        momentum = residual + b * momentum
        lap_mom = apply_laplace_(st, momentum)
        return (x, momentum, lap_mom, residual, i + 1)

    x, _, _, residual, iters = jax.lax.while_loop(
        cond, body, (x0, momentum, lap_mom, residual, jnp.asarray(0))
    )
    return x, iters


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def solve_pressure_cg(
    divergence: Array,
    stencil: LaplaceStencil,
    accuracy: float = 1e-5,
    max_iterations: int = 500,
) -> Array:
    """Pressure from velocity divergence: solves A p = div.

    divergence: [B, H, W, 1] -> pressure [B, H, W, 1].
    """
    p, _ = conjugate_gradient(divergence[..., 0], stencil, accuracy, max_iterations)
    return p[..., None]


def _solve_fwd(divergence, stencil, accuracy, max_iterations):
    p = solve_pressure_cg(divergence, stencil, accuracy, max_iterations)
    return p, stencil


def _solve_bwd(accuracy, max_iterations, stencil, g):
    # A is symmetric: d(div) = A^-1 g, i.e. another CG solve on the cotangent
    # (reference sparse.py:106-107).
    gp, _ = conjugate_gradient(g[..., 0], stencil, accuracy, max_iterations)
    zero_st = jax.tree_util.tree_map(jnp.zeros_like, stencil)
    return (gp[..., None], zero_st)


solve_pressure_cg.defvjp(_solve_fwd, _solve_bwd)
