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

Both are shape-static and fall back to interpret mode off TPU (unit tests
run on CPU).  Reference equivalence: the torch model's native ``Conv3d``
(``video_diffusion_pytorch_conv3d.py:189-204``) — the decomposition itself
is validated against ``jax.lax.conv_general_dilated`` 3D in
``tests/test_conv3d_packed.py``.

Two grid strategies:

* v2 (default for ``kd == 3``, every ResBlock conv): grid over ``nb``-row
  blocks with single-row halo reads and a host-precomputed ``[n, kd]``
  frame-validity mask.  Each input row is read ~``(nb + 2) / nb`` times and
  the grid is ``n / nb`` steps — the r3 v1 A/B showed per-grid-step launch
  latency (~7 us x 144 row-steps x ~16 conv sites) dominating, so fewer,
  fatter steps are the win.
* v1 (``kd != 3``, i.e. only the 7-tap init conv): grid over single rows,
  each step reading all ``kd`` neighbour rows.  Kept because the init
  conv's ``kd*co = 448``-lane blocks would blow VMEM at useful ``nb``.
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


def _pick_nb(n: int, row_bytes: int, budget: int = 13 * 2**20) -> int:
    """Largest block height ``nb`` (<= 16) dividing ``n`` whose TOTAL
    scoped-VMEM footprint fits under ``budget`` (hard limit 16 MB/core).

    Footprint model, calibrated against Mosaic's scoped-allocation report
    at the level-0 smoke shape ([144,40,40,192]): double-buffered I/O
    (main ``nb`` rows + 2 halo rows in, ``nb/kd``-width rows out) plus ~6
    kernel temporaries of output width — ~``row_bytes*(4.67*nb + 4)``.
    Returns 0 when even ``nb = 2`` does not fit (callers then use the
    per-row v1 path)."""
    for nb in range(min(16, n), 1, -1):
        if n % nb == 0 and row_bytes * (4.67 * nb + 4.0) <= budget:
            return nb
    return 0


def _v1_fits(row_bytes_in: int, row_bytes_out: int, kd: int,
             f32_temps: int, budget: int = 14 * 2**20) -> bool:
    """Whether the per-row (v1) kernel's scoped-VMEM footprint fits: kd
    double-buffered input rows + double-buffered output row + f32
    temporaries.  At the super SR chain's level-1 shapes ([240, 80, 80,
    192] bf16) this reaches ~22 MB and Mosaic refuses the 16 MB/core
    limit (caught live by the r5 warm run) — callers then fall back to
    the XLA slice+add path, which at those sizes is bandwidth-comparable
    anyway."""
    return 2 * kd * row_bytes_in + 2 * row_bytes_out + f32_temps <= budget


def _block_frame_masks(i, nb: int, f: int):
    """Per-row frame-validity masks for the v2 block kernels, computed from
    the grid index (a ``[nb,3]`` mask *input* would need an illegal TPU
    block shape).  Row ``rr`` of grid block ``i`` is global row
    ``i*nb + rr`` with frame ``j = row % f``; a ``-1``-shifted source is
    valid iff ``j >= 1``, a ``+1``-shifted one iff ``j + 1 < f`` (crossing a
    batch boundary always crosses a frame boundary, so these predicates
    also cover rows clipped at the array ends)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, 1, 1), 0) + i * nb
    j = jax.lax.rem(row, f)
    return j >= 1, j + 1 < f  # valid for source rows r-1 / r+1


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


def _tap_sum_block_kernel(co, has_bias, nb, f, *refs):
    # kd == 3.  refs: main [nb,H,W,3co], prev [1,H,W,3co], nxt [1,H,W,3co],
    # (bias [1,co])?, out [nb,H,W,co]
    main, prev, nxt = refs[:3]
    bias = refs[3] if has_bias else None
    o_ref = refs[-1]
    m_lo, m_hi = _block_frame_masks(pl.program_id(0), nb, f)
    # accumulate in the input dtype — identical to the XLA slice+add chain
    # this replaces (f32 temps here blew the 16M scoped-VMEM limit at the
    # level-0 [144,40,40,192] shape)
    zero = jnp.zeros((), main.dtype)
    acc = main[:, :, :, co:2 * co]
    # tap 0 (reads row r-1's tap-0 lanes): rr=0 comes from the halo
    m0 = main[:, :, :, :co]
    src0 = jnp.concatenate([prev[:, :, :, :co], m0[:nb - 1]], axis=0)
    acc = acc + jnp.where(m_lo, src0, zero)
    # tap 2 (reads row r+1's tap-2 lanes)
    m2 = main[:, :, :, 2 * co:]
    src2 = jnp.concatenate([m2[1:], nxt[:, :, :, 2 * co:]], axis=0)
    acc = acc + jnp.where(m_hi, src2, zero)
    if has_bias:
        acc = acc + bias[0]
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kd", "co", "f"))
def tap_sum(y: Array, bias: Optional[Array], *, kd: int, co: int, f: int) -> Array:
    """Shifted tap-sum of a tap-packed conv output.

    y: ``[B*F, H, W, kd*co]``; bias: ``[co]`` or None.  Returns
    ``[B*F, H, W, co]`` with ``out[b, j] = bias + sum_dt y[b, j + dt - ctr,
    tap dt]`` (frame-local shifts, out-of-range taps dropped).
    """
    n, h, w, _ = y.shape
    ctr = kd // 2
    isz = y.dtype.itemsize
    nb = _pick_nb(n, h * w * kd * co * isz) if kd == 3 else 0

    if not nb and not _v1_fits(h * w * kd * co * isz, h * w * co * isz, kd,
                               (kd + 2) * h * w * co * 4):
        from .conv3d_packed import _taps_to_frames

        out = _taps_to_frames(y, kd, co, f)
        return out if bias is None else out + bias.astype(out.dtype)

    if nb:
        in_specs = [
            pl.BlockSpec((nb, h, w, kd * co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, kd * co),
                         lambda i: (jnp.maximum(i * nb - 1, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, kd * co),
                         lambda i: (jnp.minimum((i + 1) * nb, n - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [y, y, y]
        if bias is not None:
            in_specs.append(
                pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM))
            args.append(bias.reshape(1, co))
        return pl.pallas_call(
            functools.partial(_tap_sum_block_kernel, co, bias is not None, nb, f),
            grid=(n // nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((nb, h, w, co), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h, w, co), y.dtype),
            interpret=not _on_tpu(),
        )(*args)

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


def _tap_pack_block_kernel(co, nb, f, *refs):
    # kd == 3.  refs: main [nb,H,W,co], prev [1,H,W,co], nxt [1,H,W,co],
    # out [nb,H,W,3co]
    main, prev, nxt, o_ref = refs
    m_lo, m_hi = _block_frame_masks(pl.program_id(0), nb, f)
    zero = jnp.zeros((), main.dtype)
    gm = main[...]
    # tap 0 (reads g[r + 1]): shift down one; rr=nb-1 comes from the halo
    src0 = jnp.concatenate([gm[1:], nxt[...]], axis=0)
    # tap 2 (reads g[r - 1])
    src2 = jnp.concatenate([prev[...], gm[:nb - 1]], axis=0)
    out = jnp.concatenate(
        [jnp.where(m_hi, src0, zero), gm, jnp.where(m_lo, src2, zero)],
        axis=-1)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kd", "co", "f"))
def tap_pack(g: Array, *, kd: int, co: int, f: int) -> Array:
    """Adjoint of :func:`tap_sum` (bias aside): scatter ``g [B*F, H, W, co]``
    into the tap-packed layout ``[B*F, H, W, kd*co]`` with
    ``out[b, j, tap dt] = g[b, j - (dt - ctr)]`` (frame-local, zero-padded).
    """
    n, h, w, _ = g.shape
    ctr = kd // 2
    isz = g.dtype.itemsize
    nb = _pick_nb(n, h * w * kd * co * isz) if kd == 3 else 0

    if not nb and not _v1_fits(h * w * co * isz, h * w * kd * co * isz, kd,
                               2 * kd * h * w * co * 4):
        from .conv3d_packed import _shift_frames

        g5 = g.reshape(n // f, f, h, w, co)
        return jnp.concatenate(
            [_shift_frames(g5, ctr - dt) for dt in range(kd)], axis=-1
        ).reshape(n, h, w, kd * co)

    if nb:
        in_specs = [
            pl.BlockSpec((nb, h, w, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, co),
                         lambda i: (jnp.maximum(i * nb - 1, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, co),
                         lambda i: (jnp.minimum((i + 1) * nb, n - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            functools.partial(_tap_pack_block_kernel, co, nb, f),
            grid=(n // nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((nb, h, w, kd * co), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h, w, kd * co), g.dtype),
            interpret=not _on_tpu(),
        )(g, g, g)

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
