"""Pallas conv weight-grad with fused temporal tap packing (VERDICT r3 #4).

The one identified lever between ~20% and ~30% MFU on the smoke train step:
the r2 op-level trace pins ~25 ms/step in conv weight-grads running at
50.9 TF/s while the best conv in the same step reaches 110 TF/s — XLA's
wgrad lowering contracts over the spatial positions through the 40-wide
H/W dims in an awkward layout.  This kernel reformulates the weight-grad
as the matmul it is:

    dk[dh, dw, ci, n] = sum_r  x_shift(dh,dw)[r, ci] * gpack[r, n]

over all r = (batch*frame, y, x) positions, with the kh*kw spatial shifts
materialized **in VMEM only** (an XLA im2col would write a 265 MB HBM
tensor at the level-0 shape) and contracted on the MXU as kh dots of
``[kw*ci, K] x [K, kd*co]`` per frame-row — full 128-lane tiles on both
output dims for every interior site in the published UNet3D (192x192 at
level 0).

For kd == 3 (every interior conv) the temporal tap packing of the
cotangent is fused too: the kernel reads single-row halo blocks of the raw
cotangent (the proven tap_sum-v2 pattern, `tap_epilogue.py`) and builds
``gpack = [g[r+1] | g[r] | g[r-1]]`` with frame-boundary masks through a
one-row VMEM scratch — the 3x-cotangent HBM tensor the XLA path
materializes via `tap_pack` never exists.  Mosaic cannot concatenate
sub-128-lane vectors on the lane dim, so both the tap pack and the im2col
stage are assembled by lane-offset stores into scratch, not
`jnp.concatenate`.

The grid is intentionally coarse (``nb`` frame-rows per step, inner Python
unroll over rows): per-step Pallas launch latency is ~7 us on this chip
(r3 tap-epilogue A/B), so a fine grid eats the MXU win — the inner loop
keeps every temporary at one-row size while amortizing the launch over
``nb`` rows of dots.

Numerics: MXU dots accumulate in f32 (`preferred_element_type`), summed
across rows/blocks in an f32 output that lives in VMEM for the whole grid;
the result is cast to the input dtype at the end — at least as accurate as
XLA's wgrad at the same input dtype.

Reference precedent for hand-lowering the hot op:
``smoke/phi/solver/cuda/src/pressure_solve_op.cu.cc:70-219`` (the
reference's own CUDA pressure kernel).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

__all__ = ["conv_dw_fused", "conv_dw_packed", "pick_nb"]

# Calibrated on chip: Mosaic's stack temporaries roughly double the
# analytic model against the 16 MB scoped-VMEM hard limit — 9 MB (nb=6 at
# the level-0 site) OOM'd; 7.5 MB (nb=4 there, nb=2 at the 128-in decoder
# site) compiles and measured fastest (bench 7.566 vs 7.543 at 7 MB).
_VMEM_BUDGET = int(os.environ.get("WDNO_DW_VMEM", 7864320))


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _footprint(nb: int, h: int, w: int, ci: int, ncols: int, kh: int, kw: int,
               itemsize: int, fuse_co: int) -> float:
    """Scoped-VMEM model for one grid step (bytes): double-buffered input
    blocks scale with ``nb``; the per-row scratch/temps do not."""
    hw = h * w
    g_in = fuse_co if fuse_co else ncols
    io = 2 * nb * hw * (ci + g_in) * itemsize        # pipelined in-blocks
    xp = (h + kh - 1) * (w + kw - 1) * ci * itemsize  # one padded row
    stage = hw * kw * ci * itemsize                   # one im2col stage row
    gpack = hw * ncols * itemsize                     # one packed-cotangent row
    out = kh * kw * ci * ncols * 4
    return io + xp + 2 * stage + 2 * gpack + out


def pick_nb(n: int, h: int, w: int, ci: int, ncols: int, kh: int, kw: int,
            itemsize: int, fuse_co: int = 0, budget: int = _VMEM_BUDGET) -> int:
    """Largest row-block size (<= 16) dividing ``n`` that fits the VMEM
    model; 0 when even nb=1 does not fit (caller falls back to XLA)."""
    for nb in range(min(16, n), 0, -1):
        if n % nb == 0 and _footprint(nb, h, w, ci, ncols, kh, kw,
                                      itemsize, fuse_co) <= budget:
            return nb
    return 0


def _dw_row(o_ref, xs_ref, x_row, gp2, kh: int, kw: int, ci: int):
    """One frame-row's im2col + dots, accumulated into the f32 output."""
    h, w, _ = x_row.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x_row, ((ph, ph), (pw, pw), (0, 0)))
    for dh in range(kh):
        for dw in range(kw):
            xs_ref[..., dw * ci:(dw + 1) * ci] = xp[dh:dh + h, dw:dw + w, :]
        acc = jax.lax.dot_general(
            xs_ref[...].reshape(h * w, kw * ci), gp2,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        sl = slice(dh * kw * ci, (dh + 1) * kw * ci)
        o_ref[sl, :] = o_ref[sl, :] + acc


def _dw_fused_kernel(kh, kw, ci, co, nb, f,
                     x_ref, g_ref, gp_ref, gn_ref, o_ref, gs_ref, xs_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    for r in range(nb):
        row = i * nb + r
        j = jax.lax.rem(row, f)
        g = g_ref[r]
        # tap order matches tap_pack/_shift_frames(g, ctr - dt):
        # tap 0 = g[row+1], tap 1 = g[row], tap 2 = g[row-1], frame-local
        prv = gp_ref[0] if r == 0 else g_ref[r - 1]
        nxt = gn_ref[0] if r == nb - 1 else g_ref[r + 1]
        zero = jnp.zeros((), g.dtype)
        gs_ref[..., 0:co] = jnp.where(j + 1 < f, nxt, zero)
        gs_ref[..., co:2 * co] = g
        gs_ref[..., 2 * co:3 * co] = jnp.where(j >= 1, prv, zero)
        _dw_row(o_ref, xs_ref, x_ref[r],
                gs_ref[...].reshape(g.shape[0] * g.shape[1], 3 * co),
                kh, kw, ci)


def _dw_packed_kernel(kh, kw, ci, ncols, nb, x_ref, gp_ref, o_ref, xs_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    for r in range(nb):
        gp = gp_ref[r]
        _dw_row(o_ref, xs_ref, x_ref[r],
                gp.reshape(gp.shape[0] * gp.shape[1], ncols), kh, kw, ci)


@functools.partial(jax.jit, static_argnames=("kh", "kw", "f"))
def conv_dw_fused(x: Array, g: Array, *, kh: int, kw: int, f: int) -> Array:
    """Weight-grad of the tap-packed SAME conv for kd == 3, tap packing
    fused.  x: [R, H, W, ci] flat batch*frame rows; g: [R, H, W, co] raw
    cotangent.  Returns dk2 [kh, kw, ci, 3*co] in x.dtype (f32-accumulated),
    equivalent to the XLA wgrad of the packed conv fed by tap_pack."""
    n, h, w, ci = x.shape
    co = g.shape[-1]
    nb = pick_nb(n, h, w, ci, 3 * co, kh, kw, x.dtype.itemsize, fuse_co=co)
    if nb == 0:
        raise ValueError(f"no row block fits VMEM for {x.shape} -> use XLA path")
    out = pl.pallas_call(
        functools.partial(_dw_fused_kernel, kh, kw, ci, co, nb, f),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, h, w, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h, w, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, co), lambda i: (jnp.maximum(i * nb - 1, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, co), lambda i: (jnp.minimum((i + 1) * nb, n - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kh * kw * ci, 3 * co), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kh * kw * ci, 3 * co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, w, 3 * co), g.dtype),
                        pltpu.VMEM((h, w, kw * ci), x.dtype)],
        interpret=not _on_tpu(),
    )(x, g, g, g)
    return out.reshape(kh, kw, ci, 3 * co).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("kh", "kw"))
def conv_dw_packed(x: Array, gpack: Array, *, kh: int, kw: int) -> Array:
    """Weight-grad of a SAME 2D conv from a pre-packed cotangent (any
    column count — the kd=7 init conv, or kd=1 spatial convs where
    gpack == g).  x: [R, H, W, ci]; gpack: [R, H, W, N].  Returns
    dk2 [kh, kw, ci, N] in x.dtype."""
    n, h, w, ci = x.shape
    ncols = gpack.shape[-1]
    nb = pick_nb(n, h, w, ci, ncols, kh, kw, x.dtype.itemsize)
    if nb == 0:
        raise ValueError(f"no row block fits VMEM for {x.shape} -> use XLA path")
    out = pl.pallas_call(
        functools.partial(_dw_packed_kernel, kh, kw, ci, ncols, nb),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, h, w, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h, w, ncols), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kh * kw * ci, ncols), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kh * kw * ci, ncols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, w, kw * ci), x.dtype)],
        interpret=not _on_tpu(),
    )(x, gpack)
    return out.reshape(kh, kw, ci, ncols).astype(x.dtype)
