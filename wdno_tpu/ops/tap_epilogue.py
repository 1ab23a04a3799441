"""Pallas epilogues for the tap-packed 3D convolution lowering.

:mod:`.conv3d_packed` lowers ``conv3d`` as one batched-2D conv whose output
channels pack the ``kd`` temporal taps, followed by a shifted tap-sum.  XLA
lowers that tap-sum (slice + pad + add chains, plus the bias add) as several
full passes over the activation at ~150 GB/s effective (r3 profile:
~10 ms/step across the packed-conv sites of the smoke bench step — loop
fusions 6.3 + bias 3.6 + pad 1.9 ms at ``models/layers.py:132-134``).

These kernels do each direction in ONE pass over HBM:

* :func:`tap_sum` — ``out[r] = bias + sum_dt y[r + dt - ctr, ..., tap dt]``
  over the flat batch*frame rows, with frame-boundary taps dropped.  Reads
  the ``kd``-lane-packed conv output once per tap role (kd small), writes
  the summed activation once.
* :func:`tap_pack` — the transpose: scatter a cotangent ``g`` into the
  tap-packed layout, ``out[r, ..., tap dt] = g[r - (dt - ctr)]`` (zero at
  frame boundaries).  Used for both the weight-grad cotangent packing and
  as the adjoint of :func:`tap_sum`.

Both are shape-static, grid over rows, and fall back to interpret mode off
TPU (unit tests run on CPU).  Reference equivalence: the torch model's
native ``Conv3d`` (``video_diffusion_pytorch_conv3d.py:189-204``) — the
decomposition itself is validated against ``jax.lax.conv_general_dilated``
3D in ``tests/test_conv3d_packed.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

__all__ = ["tap_sum", "tap_pack"]


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _tap_sum_kernel(kd, co, f, has_bias, n, *refs):
    # refs: kd input row-blocks [1, H, W, kd*co], (bias [1, co])?, out [1, H, W, co]
    ins, rest = refs[:kd], refs[kd:]
    bias = rest[0] if has_bias else None
    o_ref = rest[-1]
    i = pl.program_id(0)
    j = i % f
    ctr = kd // 2
    acc = ins[ctr][0, :, :, ctr * co:(ctr + 1) * co].astype(jnp.float32)
    for dt in range(kd):
        if dt == ctr:
            continue
        off = dt - ctr
        tap = ins[dt][0, :, :, dt * co:(dt + 1) * co].astype(jnp.float32)
        valid = ((j + off >= 0) & (j + off < f)).astype(jnp.float32)
        acc = acc + tap * valid
    if has_bias:
        acc = acc + bias[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kd", "co", "f"))
def tap_sum(y: Array, bias: Optional[Array], *, kd: int, co: int, f: int) -> Array:
    """Shifted tap-sum of a tap-packed conv output.

    y: ``[B*F, H, W, kd*co]``; bias: ``[co]`` or None.  Returns
    ``[B*F, H, W, co]`` with ``out[b, j] = bias + sum_dt y[b, j + dt - ctr,
    tap dt]`` (frame-local shifts, out-of-range taps dropped).
    """
    n, h, w, _ = y.shape
    ctr = kd // 2

    def row_spec(off):
        return pl.BlockSpec(
            (1, h, w, kd * co),
            lambda i, off=off: (jnp.clip(i + off, 0, n - 1), 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [row_spec(dt - ctr) for dt in range(kd)]
    args = [y] * kd
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, co))
    return pl.pallas_call(
        functools.partial(_tap_sum_kernel, kd, co, f, bias is not None, n),
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), y.dtype),
        interpret=not _on_tpu(),
    )(*args)


def _tap_pack_kernel(kd, co, f, n, *refs):
    # refs: kd cotangent row-blocks [1, H, W, co], out [1, H, W, kd*co]
    ins = refs[:kd]
    o_ref = refs[-1]
    i = pl.program_id(0)
    j = i % f
    ctr = kd // 2
    parts = []
    for dt in range(kd):
        off = dt - ctr  # out row r, tap dt <- g[r - off]
        g = ins[dt][0].astype(jnp.float32)
        valid = ((j - off >= 0) & (j - off < f)).astype(jnp.float32)
        parts.append(g * valid)
    o_ref[0] = jnp.concatenate(parts, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kd", "co", "f"))
def tap_pack(g: Array, *, kd: int, co: int, f: int) -> Array:
    """Adjoint of :func:`tap_sum` (bias aside): scatter ``g [B*F, H, W, co]``
    into the tap-packed layout ``[B*F, H, W, kd*co]`` with
    ``out[b, j, tap dt] = g[b, j - (dt - ctr)]`` (frame-local, zero-padded).
    """
    n, h, w, _ = g.shape
    ctr = kd // 2

    def row_spec(off):
        return pl.BlockSpec(
            (1, h, w, co),
            lambda i, off=off: (jnp.clip(i - off, 0, n - 1), 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        functools.partial(_tap_pack_kernel, kd, co, f, n),
        grid=(n,),
        in_specs=[row_spec(dt - ctr) for dt in range(kd)],
        out_specs=pl.BlockSpec((1, h, w, kd * co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, kd * co), g.dtype),
        interpret=not _on_tpu(),
    )(*([g] * kd))
