"""Fused Pallas TPU kernel for the masked-Laplacian stencil apply.

The TPU equivalent of the reference CUDA solver's diagonal-offset SpMV
(``phi/solver/cuda/src/pressure_solve_op.cu.cc:19-48`` ``calcZ_v4``): one
kernel evaluates ``A p`` for a [H, W] pressure block entirely in VMEM —
five multiply-adds over shifted views, one HBM read of p + the stencil
coefficients, one write.  Used inside the CG loop as a drop-in for
:func:`..pressure.apply_laplace`; the XLA implementation remains the
portable fallback (reference keeps SciPy CG as its fallback the same way,
``sparse.py:100-101``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pressure import LaplaceStencil

__all__ = ["apply_laplace_fused"]


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _stencil_kernel(p_ref, c_ref, uy_ref, dy_ref, ux_ref, dx_ref, o_ref):
    p = p_ref[0]  # [H, W]
    H, W = p.shape
    zrow = jnp.zeros((1, W), p.dtype)
    zcol = jnp.zeros((H, 1), p.dtype)
    up_y = jnp.concatenate([p[1:, :], zrow], axis=0)
    down_y = jnp.concatenate([zrow, p[:-1, :]], axis=0)
    up_x = jnp.concatenate([p[:, 1:], zcol], axis=1)
    down_x = jnp.concatenate([zcol, p[:, :-1]], axis=1)
    o_ref[0] = (
        c_ref[0] * p
        + uy_ref[0] * up_y
        + dy_ref[0] * down_y
        + ux_ref[0] * up_x
        + dx_ref[0] * down_x
    )


@jax.jit
def apply_laplace_fused(st: LaplaceStencil, p: jnp.ndarray) -> jnp.ndarray:
    """(A p) over [B, H, W] via one fused VMEM pass per batch element."""
    B, H, W = p.shape

    def spec():
        return pl.BlockSpec((1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def bcast(c):
        return jnp.broadcast_to(jnp.asarray(c, p.dtype), (B, H, W))

    return pl.pallas_call(
        _stencil_kernel,
        grid=(B,),
        in_specs=[spec()] * 6,
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((B, H, W), p.dtype),
        interpret=not _on_tpu(),
    )(p, bcast(st.center), bcast(st.up_y), bcast(st.down_y), bcast(st.up_x), bcast(st.down_x))
