"""Fused GroupNorm + FiLM + SiLU as Pallas TPU kernels (forward + VJP).

Every ConvBlock in both denoisers ends in GroupNorm -> FiLM(time emb) ->
SiLU (reference ``burgers/ddpm_burgers/unet.py:129-148``,
``smoke/video_diffusion_pytorch/video_diffusion_pytorch_conv3d.py:189-204``).
XLA lowers the GroupNorm statistics by reshaping channels to ``[..., G,
C/G]`` — with the published ``groups=8`` that makes the minor dimension 8,
so the reduction runs at ~6% lane utilization: the r2 profile of the bench
step shows six ``convert_reduce_fusion`` ops at ~1.7 ms each (a 29 MB input
should reduce in ~0.05 ms) plus a long tail of normalize/FiLM/SiLU loop
fusions at 54-77 GB/s effective.

The fused op keeps the channel axis as the lane dimension throughout:

- ``_stats``:  grid (B, N-blocks), accumulates per-channel sum / sum-of-
  squares in f32; the tiny [C] -> [G] group fold happens outside in XLA.
- the whole normalize+FiLM chain collapses to ``x * A + B`` with per-
  (batch, channel) rows ``A = gamma * rstd * (scale+1)`` and
  ``B = (beta - mean * gamma * rstd) * (scale+1) + shift``.
- ``_apply``:  ``out = silu(x * A + B)`` in one pass.
- backward: two passes (per-channel partial reductions, then dx), with the
  GroupNorm cross-terms S1 = sum_g(dy), S2 = sum_g(dy * y_hat) folded per
  group outside the kernel.

``gn_film_silu`` is numerically equivalent to
``silu(FiLM(flax.linen.GroupNorm(x)))`` (f32 statistics, eps inside the
rsqrt); a pure-jnp reference path serves CPU/f64 and as the test oracle.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# per-block VMEM budget for the [Nb, C] x tile (f32 working set)
_BLOCK_BYTES = int(os.environ.get('WDNO_GN_BLOCK_BYTES', 1 << 20))


def _nb_for(n: int, c: int) -> int:
    nb = max(8, _BLOCK_BYTES // (4 * c))
    nb = (nb // 8) * 8
    return min(n, nb)


def _row_spec(c):
    # one coefficient row per batch element; rows are carried as [B, 1, C]
    # (Mosaic requires the last two block dims divisible by (8, 128) or
    # equal to the array dims — a 2D [B, C] block (1, C) violates that)
    return pl.BlockSpec((1, 1, c), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM)


def _x_spec(nb, c):
    return pl.BlockSpec((1, nb, c), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)


def _stats_kernel(n, nb, x_ref, s_ref, s2_ref):
    j = pl.program_id(1)
    xb = x_ref[0].astype(jnp.float32)  # [Nb, C]
    rows = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 0) + j * nb
    xm = jnp.where(rows < n, xb, 0.0)
    s = jnp.sum(xm, axis=0, keepdims=True)
    s2 = jnp.sum(xm * xm, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _():
        s_ref[0] = s
        s2_ref[0] = s2

    @pl.when(j > 0)
    def _():
        s_ref[0] += s
        s2_ref[0] += s2


def _apply_kernel(x_ref, a_ref, b_ref, o_ref):
    w = x_ref[0].astype(jnp.float32) * a_ref[0] + b_ref[0]
    o_ref[0] = (w * jax.nn.sigmoid(w)).astype(o_ref.dtype)


def _bwd1_kernel(n, nb, x_ref, g_ref, a_ref, b_ref, mean_ref, rstd_ref,
                 gamma_ref, beta_ref, sp1_ref,
                 pdw_ref, pdwz_ref, pdz_ref, pdzy_ref):
    """Per-(b, channel) partial reductions of the FiLM/GN backward."""
    j = pl.program_id(1)
    xb = x_ref[0].astype(jnp.float32)
    gb = g_ref[0].astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 0) + j * nb
    valid = rows < n
    w = xb * a_ref[0] + b_ref[0]
    sig = jax.nn.sigmoid(w)
    dw = gb * sig * (1.0 + w * (1.0 - sig))
    dw = jnp.where(valid, dw, 0.0)
    y_hat = (xb - mean_ref[0]) * rstd_ref[0]
    z = y_hat * gamma_ref[0] + beta_ref[0]
    dz = dw * sp1_ref[0]
    pdw = jnp.sum(dw, axis=0, keepdims=True)
    pdwz = jnp.sum(dw * z, axis=0, keepdims=True)
    pdz = jnp.sum(dz, axis=0, keepdims=True)
    pdzy = jnp.sum(dz * y_hat, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _():
        pdw_ref[0] = pdw
        pdwz_ref[0] = pdwz
        pdz_ref[0] = pdz
        pdzy_ref[0] = pdzy

    @pl.when(j > 0)
    def _():
        pdw_ref[0] += pdw
        pdwz_ref[0] += pdwz
        pdz_ref[0] += pdz
        pdzy_ref[0] += pdzy


def _bwd2_kernel(x_ref, g_ref, a_ref, b_ref, mean_ref, rstd_ref,
                 gsp_ref, s1m_ref, s2m_ref, dx_ref):
    """dx = rstd * (gamma*(scale+1)*dsilu(g) - S1/m - y_hat * S2/m)."""
    xb = x_ref[0].astype(jnp.float32)
    gb = g_ref[0].astype(jnp.float32)
    w = xb * a_ref[0] + b_ref[0]
    sig = jax.nn.sigmoid(w)
    dw = gb * sig * (1.0 + w * (1.0 - sig))
    y_hat = (xb - mean_ref[0]) * rstd_ref[0]
    dy = dw * gsp_ref[0]  # gamma * (scale+1) folded into one row
    dx = rstd_ref[0] * (dy - s1m_ref[0] - y_hat * s2m_ref[0])
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _pallas_stats(x: Array, interpret: bool = False) -> Tuple[Array, Array]:
    bsz, n, c = x.shape
    nb = _nb_for(n, c)
    grid = (bsz, pl.cdiv(n, nb))
    s, s2 = pl.pallas_call(
        functools.partial(_stats_kernel, n, nb),
        grid=grid,
        in_specs=[_x_spec(nb, c)],
        out_specs=(_row_spec(c), _row_spec(c)),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
        ),
        interpret=interpret,
    )(x)
    return s[:, 0], s2[:, 0]


def _pallas_apply(x: Array, a: Array, b: Array, interpret: bool = False) -> Array:
    bsz, n, c = x.shape
    nb = _nb_for(n, c)
    return pl.pallas_call(
        _apply_kernel,
        grid=(bsz, pl.cdiv(n, nb)),
        in_specs=[_x_spec(nb, c), _row_spec(c), _row_spec(c)],
        out_specs=_x_spec(nb, c),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, a[:, None], b[:, None])


def _group_fold(v: Array, groups: int) -> Array:
    b, c = v.shape
    return v.reshape(b, groups, c // groups).sum(-1)


def _group_rep(v: Array, c: int) -> Array:
    b, g = v.shape
    return jnp.repeat(v, c // g, axis=-1)


def _coeffs(s, s2, gamma, beta, scale, shift, groups, eps, n, c):
    """Collapse GN+FiLM into per-(batch, channel) rows A, B (f32)."""
    m = n * (c // groups)
    mean_g = _group_fold(s, groups) / m
    ex2_g = _group_fold(s2, groups) / m
    # one-pass E[x^2]-mean^2 can go slightly negative in f32 for
    # near-constant large-magnitude groups — clamp so rsqrt never sees a
    # value below eps (flax's central variance is non-negative by
    # construction; this keeps the fused path equally robust)
    rstd_g = jax.lax.rsqrt(jnp.maximum(ex2_g - mean_g * mean_g, 0.0) + eps)
    mean = _group_rep(mean_g, c)
    rstd = _group_rep(rstd_g, c)
    gamma = gamma.astype(jnp.float32)[None, :]
    beta = beta.astype(jnp.float32)[None, :]
    sp1 = (scale.astype(jnp.float32) + 1.0) if scale is not None else jnp.ones((1, 1))
    sh = shift.astype(jnp.float32) if shift is not None else jnp.zeros((1, 1))
    a0 = gamma * rstd
    b0 = beta - mean * a0
    a = a0 * sp1
    bb = b0 * sp1 + sh
    ones = jnp.ones((s.shape[0], 1), jnp.float32)
    return (mean, rstd, jnp.broadcast_to(a, (s.shape[0], c)),
            jnp.broadcast_to(bb, (s.shape[0], c)),
            jnp.broadcast_to(sp1 * ones, (s.shape[0], c)))


def _use_pallas(x: Array) -> bool:
    """Whether to run the Pallas kernels (WDNO_FUSED_GN=1) instead of the
    restructured XLA path (default).

    Measured on TPU v5e (benchmarks/norm_bench.py, fwd+dx of the smoke
    bench-config GN+FiLM+SiLU): flax's GroupNorm form ~1.7 ms for the stats
    reduce ALONE (the [..., G, C/G] minor-dim-8 layout); this module's
    restructured XLA path 1.79 ms TOTAL; the Pallas kernels 2.48 ms (the 4
    extra kernel launches outweigh the fusion win at these sizes).  The
    restructured XLA form is therefore the default; the kernels stay as the
    measured alternative and the CPU-testable specification of the math.
    """
    env = os.environ.get("WDNO_FUSED_GN", "auto")
    if env == "0":
        return False
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    return env == "1"


# ---------------------------------------------------------------------------
# custom-VJP core over the flattened [B, N, C] state


def _fwd_impl(cfg, x, gamma, beta, scale, shift):
    groups, eps, pallas, interpret = cfg[:4]
    bsz, n, c = x.shape
    if pallas:
        s, s2 = _pallas_stats(x, interpret)
    else:
        # keep f64 inputs at f64 so double-precision parity probes aren't
        # noise-floored (matches ChannelLayerNorm's promotion rule)
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        s, s2 = xf.sum(1), (xf * xf).sum(1)
    mean, rstd, a, b, sp1 = _coeffs(s, s2, gamma, beta, scale, shift,
                                    groups, eps, n, c)
    if pallas:
        out = _pallas_apply(x, a, b, interpret)
    else:
        w = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        w = w * a[:, None, :] + b[:, None, :]
        out = (w * jax.nn.sigmoid(w)).astype(x.dtype)
    return out, (mean, rstd, a, b, sp1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core(cfg, x, gamma, beta, scale, shift):
    return _fwd_impl(cfg, x, gamma, beta, scale, shift)[0]


def _core_bwd(cfg, res, g):
    groups, eps, pallas, interpret, has_film, film_dtype = cfg
    (x, gamma, beta, mean, rstd, a, b, sp1) = res
    bsz, n, c = x.shape
    gamma_row = jnp.broadcast_to(gamma.astype(jnp.float32)[None, :], (bsz, c))
    beta_row = jnp.broadcast_to(beta.astype(jnp.float32)[None, :], (bsz, c))
    if pallas:
        nb = _nb_for(n, c)
        grid = (bsz, pl.cdiv(n, nb))
        row = _row_spec(c)
        pdw, pdwz, pdz, pdzy = pl.pallas_call(
            functools.partial(_bwd1_kernel, n, nb),
            grid=grid,
            in_specs=[_x_spec(nb, c), _x_spec(nb, c), row, row, row, row,
                      row, row, row],
            out_specs=(row, row, row, row),
            out_shape=tuple(
                jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32) for _ in range(4)
            ),
            interpret=interpret,
        )(x, g, a[:, None], b[:, None], mean[:, None], rstd[:, None],
          gamma_row[:, None], beta_row[:, None], sp1[:, None])
        pdw, pdwz, pdz, pdzy = (v[:, 0] for v in (pdw, pdwz, pdz, pdzy))
    else:
        # promote (not downcast) so f64 gradient-parity probes stay at f64,
        # mirroring _fwd_impl's promotion rule
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        gf = g.astype(jnp.promote_types(g.dtype, jnp.float32))
        w = xf * a[:, None, :] + b[:, None, :]
        sig = jax.nn.sigmoid(w)
        dw = gf * sig * (1.0 + w * (1.0 - sig))
        y_hat = (xf - mean[:, None, :]) * rstd[:, None, :]
        z = y_hat * gamma_row[:, None, :] + beta_row[:, None, :]
        dz = dw * sp1[:, None, :]
        pdw, pdwz = dw.sum(1), (dw * z).sum(1)
        pdz, pdzy = dz.sum(1), (dz * y_hat).sum(1)

    m = n * (c // groups)
    s1 = _group_rep(_group_fold(pdz * gamma_row, groups), c) / m
    s2 = _group_rep(_group_fold(pdzy * gamma_row, groups), c) / m
    gsp = gamma_row * sp1
    if pallas:
        dx = pl.pallas_call(
            _bwd2_kernel,
            grid=grid,
            in_specs=[_x_spec(nb, c), _x_spec(nb, c), row, row, row, row,
                      row, row, row],
            out_specs=_x_spec(nb, c),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interpret,
        )(x, g, a[:, None], b[:, None], mean[:, None], rstd[:, None],
          gsp[:, None], s1[:, None], s2[:, None])
    else:
        dy = dw * gsp[:, None, :]
        dx = (rstd[:, None, :] * (dy - s1[:, None, :] - y_hat * s2[:, None, :])
              ).astype(x.dtype)

    dgamma = pdzy.sum(0).astype(gamma.dtype)
    dbeta = pdz.sum(0).astype(gamma.dtype)
    if has_film:
        dscale = pdwz.astype(jnp.dtype(film_dtype))
        dshift = pdw.astype(jnp.dtype(film_dtype))
    else:
        dscale = dshift = None
    return dx, dgamma, dbeta, dscale, dshift


def _core_fwd(cfg, x, gamma, beta, scale, shift):
    out, (mean, rstd, a, b, sp1) = _fwd_impl(cfg, x, gamma, beta, scale, shift)
    return out, (x, gamma, beta, mean, rstd, a, b, sp1)


_core.defvjp(_core_fwd, _core_bwd)


def gn_film_silu(
    x: Array,
    gamma: Array,
    beta: Array,
    scale: Optional[Array] = None,
    shift: Optional[Array] = None,
    *,
    groups: int,
    eps: float = 1e-5,
) -> Array:
    """``silu(FiLM(GroupNorm(x)))`` fused over the flattened spatial axes.

    x: ``[B, *spatial, C]``; gamma/beta: ``[C]``; scale/shift: ``[B, C]``
    (both or neither).  Equivalent to
    ``nn.silu(GroupNorm(groups)(x) * (scale+1) + shift)`` with f32 statistics.
    """
    assert (scale is None) == (shift is None)
    orig_shape = x.shape
    bsz, c = x.shape[0], x.shape[-1]
    assert c % groups == 0, (c, groups)
    xf = x.reshape(bsz, -1, c)
    pallas = _use_pallas(x)
    interpret = pallas and jax.default_backend() != "tpu"
    film_dtype = None if scale is None else str(scale.dtype)
    cfg = (groups, float(eps), pallas, interpret, scale is not None, film_dtype)
    out = _core(cfg, xf, gamma, beta, scale, shift)
    return out.reshape(orig_shape)
