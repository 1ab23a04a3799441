"""Temporally-decomposed 3D convolution with a fully lane-packed VJP.

The video U-Net's 3D convs (reference ``video_diffusion_pytorch_conv3d.py:
189-204,393``) have 64 output channels at the full-resolution levels — XLA's
native conv3d lowering half-fills the 128-wide MXU output tiles there (r2
profile: those convs run at 31-51 TF/s while the packed 448-channel init
conv reaches ~120 TF/s on the same chip).

This module lowers ``conv3d(x, K)`` (temporal stride 1, odd kernel, SAME)
as ONE batched-2D convolution whose output channels pack every temporal tap
(``kd*Co`` lanes), followed by a static shift-sum over taps:

    y[f] = sum_dt conv2d(x[f + dt - kd//2], K[dt])

and — the part plain autodiff cannot produce — gives the SAME packed
treatment to both backward convs via a custom VJP:

* dx: a 2D conv of the cotangent with the spatially+temporally reversed
  kernel packed over ``kd*Ci`` output lanes, then the same shift-sum;
* dW: XLA's native 3D weight-grad (its contraction over all B*F*H*W
  positions has the same MXU shape as the packed form, and it needs no
  shifted-cotangent scatter).

Plain AD of the forward instead transposes the packed conv into a
192-in/64-out data-grad (half-empty lanes again) — measured only +1.5%
end-to-end, vs the full packing here.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["packed_conv3d"]


def _use_dw_pallas() -> bool:
    """Pallas weight-grad (:mod:`.conv_dw_pallas`) instead of XLA's wgrad
    of the packed 2D conv.  Default: on-TPU only; WDNO_CONV_DW=0 forces the
    XLA path, =1 forces the kernel everywhere (interpret mode off-TPU)."""
    env = os.environ.get("WDNO_CONV_DW", "auto")
    if env == "0":
        return False
    return env == "1" or jax.default_backend() == "tpu"


def _use_epilogue() -> bool:
    """Single-pass Pallas tap-sum/pack epilogues (:mod:`.tap_epilogue`)
    instead of the slice+pad+add chains below.  Default: on-TPU only (the
    jnp path stays the CPU/test oracle); WDNO_TAP_EPILOGUE=0 forces it off
    everywhere, =1 on everywhere (interpret mode off-TPU)."""
    env = os.environ.get("WDNO_TAP_EPILOGUE", "auto")
    if env == "0":
        return False
    return env == "1" or jax.default_backend() == "tpu"


def _conv2d(xf: Array, k2: Array) -> Array:
    dn = jax.lax.conv_dimension_numbers(xf.shape, k2.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(xf, k2, (1, 1), "SAME", dimension_numbers=dn)


def _shift_rows(t: Array, off: int, f: int) -> Array:
    """``out[r] = t[r + off]`` over the flat [B*F, H, W, C] batch-frame rows,
    zeroing rows whose source frame ``(r % F) + off`` falls outside [0, F).

    Operating on the FLAT conv shape (frames folded into the conv batch)
    keeps the whole tap-sum elementwise in the convolution's own output
    layout: reshaping to 5D first forced XLA to materialize a
    {3,0,2,1}->{3,2,1,0} relayout copy of every packed conv output
    (~0.36 ms x 20+ sites in the r2 profile).
    """
    if off == 0:
        return t
    n = t.shape[0]
    src = t[max(0, off): n + min(0, off)]
    src = jnp.pad(src, ((max(0, -off), max(0, off)), (0, 0), (0, 0), (0, 0)))
    fidx = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1, 1), 0) % f
    valid = (fidx + off >= 0) & (fidx + off < f)
    return jnp.where(valid, src, jnp.zeros((), t.dtype))


def _taps_to_frames(y: Array, kd: int, co: int, f: int) -> Array:
    """[B*F, H, W, kd*co] tap-packed -> [B*F, H, W, co] shift-summed."""
    ctr = kd // 2
    out = y[..., ctr * co:(ctr + 1) * co]
    for dt in range(kd):
        if dt == ctr:
            continue
        out = out + _shift_rows(y[..., dt * co:(dt + 1) * co], dt - ctr, f)
    return out


def _shift_frames(t: Array, off: int) -> Array:
    """``out[:, f] = t[:, f + off]`` on the 5D frame axis (untiled: cheap)."""
    if off == 0:
        return t
    f = t.shape[1]
    src = t[:, max(0, off): f + min(0, off)]
    return jnp.pad(src, ((0, 0), (max(0, -off), max(0, off)),
                         (0, 0), (0, 0), (0, 0)))


def _fwd_impl(x: Array, k: Array, bias: Optional[Array]) -> Array:
    kd, kh, kw, ci, co = k.shape
    b, f, h, w, _ = x.shape
    k2 = k.transpose(1, 2, 3, 0, 4).reshape(kh, kw, ci, kd * co)
    y = _conv2d(x.reshape(b * f, h, w, ci), k2)
    if _use_epilogue():
        from .tap_epilogue import tap_sum

        out = tap_sum(y, None if bias is None else bias.astype(y.dtype),
                      kd=kd, co=co, f=f)
    else:
        out = _taps_to_frames(y, kd, co, f)
        if bias is not None:
            out = out + bias.astype(out.dtype)
    return out.reshape(b, f, h, w, co)


@jax.custom_vjp
def packed_conv3d(x: Array, k: Array, bias: Optional[Array] = None) -> Array:
    """``conv3d(x, k) + bias``, SAME padding, stride 1, odd ``kd`` — all
    three constituent convolutions lane-packed over the temporal taps, the
    tap-sum/bias epilogue fused into one Pallas pass on TPU.

    x: ``[B, F, H, W, Ci]``; k: ``[kd, kh, kw, Ci, Co]`` (same dtype as x);
    bias: optional ``[Co]``.
    """
    return _fwd_impl(x, k, bias)


def _pc_fwd(x, k, bias):
    return _fwd_impl(x, k, bias), (x, k, bias is not None)


def _pc_bwd(res, g):
    x, k, has_bias = res
    kd, kh, kw, ci, co = k.shape
    b, f, h, w, _ = x.shape
    epilogue = _use_epilogue()
    # dx: reversed kernel, output lanes packed over kd*ci
    krev = k[::-1, ::-1, ::-1]
    kdx = krev.transpose(1, 2, 4, 0, 3).reshape(kh, kw, co, kd * ci)
    gf = g.reshape(b * f, h, w, co)
    dxp = _conv2d(gf, kdx)
    xf = x.reshape(b * f, h, w, ci)

    # dW: Pallas im2col kernel when the block model fits VMEM (fused tap
    # packing for kd==3 — the 3x-cotangent HBM tensor never materializes);
    # XLA's wgrad of the packed 2D conv otherwise.
    dk2 = gpack = None
    if _use_dw_pallas():
        from .conv_dw_pallas import conv_dw_fused, conv_dw_packed, pick_nb

        isz = x.dtype.itemsize
        if kd == 3 and pick_nb(b * f, h, w, ci, 3 * co, kh, kw, isz, fuse_co=co) >= 2:
            if os.environ.get("WDNO_DW_DEBUG"):
                print(f"[dw] fused site x={xf.shape} co={co} kh={kh} kw={kw} "
                      f"nb={pick_nb(b * f, h, w, ci, 3 * co, kh, kw, isz, fuse_co=co)}",
                      flush=True)
            dk2 = conv_dw_fused(xf, gf, kh=kh, kw=kw, f=f)
    if epilogue:
        from .tap_epilogue import tap_pack, tap_sum

        dx = tap_sum(dxp, None, kd=kd, co=ci, f=f).reshape(b, f, h, w, ci)
        if dk2 is None:
            gpack = tap_pack(gf, kd=kd, co=co, f=f)
    else:
        dx = _taps_to_frames(dxp, kd, ci, f).reshape(b, f, h, w, ci)
        # dW cotangent scatter: shifts along the 5D frame axis — dim 1 is
        # untiled, so these are cheap DMA copies; shifting the flat
        # conv-batch rows instead fought the (8,128) sublane tiling
        # (~1.3 ms per level-0 conv), and XLA's native 3D wgrad measured
        # slightly worse end-to-end (7.43 vs 7.56 steps/s).
        if dk2 is None:
            ctr = kd // 2
            gp5 = jnp.concatenate(
                [_shift_frames(g, ctr - dt) for dt in range(kd)], axis=-1)
            gpack = gp5.reshape(b * f, h, w, kd * co)
    if dk2 is None and _use_dw_pallas():
        from .conv_dw_pallas import conv_dw_packed, pick_nb

        if pick_nb(b * f, h, w, ci, kd * co, kh, kw, x.dtype.itemsize) >= 2:
            if os.environ.get("WDNO_DW_DEBUG"):
                print(f"[dw] packed site x={xf.shape} ncols={kd * co} kh={kh} "
                      f"kw={kw} nb={pick_nb(b * f, h, w, ci, kd * co, kh, kw, x.dtype.itemsize)}",
                      flush=True)
            dk2 = conv_dw_packed(xf, gpack, kh=kh, kw=kw)
    if dk2 is None:
        k2 = k.transpose(1, 2, 3, 0, 4).reshape(kh, kw, ci, kd * co)
        _, wgrad = jax.vjp(lambda kk: _conv2d(xf, kk), k2)
        dk2, = wgrad(gpack)
    dk = dk2.reshape(kh, kw, ci, kd, co).transpose(3, 0, 1, 2, 4)
    dbias = g.sum(axis=(0, 1, 2, 3)) if has_bias else None
    return dx, dk, dbias


packed_conv3d.defvjp(_pc_fwd, _pc_bwd)


def _conv3d_native(x: Array, k: Array) -> Array:
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(x, k, (1, 1, 1), "SAME",
                                        dimension_numbers=dn)


@jax.custom_vjp
def native_conv3d_pdw(x: Array, k: Array, bias: Optional[Array] = None) -> Array:
    """Native XLA conv3d forward/data-grad with the Pallas fused-tap
    weight-grad swapped in (kd == 3, stride 1, SAME).

    The >=128-feature convs keep XLA's native conv3d for fwd/dx (measured
    fastest, r3 A/B 'vjp-all' regression) — but their weight-grads have the
    same awkward spatial contraction as the narrow convs, which
    :mod:`.conv_dw_pallas` fixes.  This wrapper changes ONLY dW.
    """
    y = _conv3d_native(x, k)
    return y if bias is None else y + bias.astype(y.dtype)


def _ncp_fwd(x, k, bias):
    return native_conv3d_pdw(x, k, bias), (x, k, bias is not None)


def _ncp_bwd(res, g):
    x, k, has_bias = res
    kd, kh, kw, ci, co = k.shape
    b, f, h, w, _ = x.shape
    _, vjp_x = jax.vjp(lambda xx: _conv3d_native(xx, k), x)
    dx, = vjp_x(g)
    dk2 = None
    # Opt-in only (WDNO_DW_NATIVE=1): measured on chip, the Pallas dW LOSES
    # at every native-lowered site in the published model — 7.296 steps/s
    # with all native sites routed here, 7.296 with the 10x10 ones excluded,
    # vs 7.460 wrapper-only / 7.515 with just the packed-path sites — XLA's
    # wgrad for the wide-channel convs is already well-shaped (r2 profile:
    # best conv 110 TF/s), and at h*w <= 400 the per-row contraction K
    # starves the MXU.  The wrapper itself costs nothing (7.4601 vs 7.4651
    # baseline), so it stays as the A/B harness for future dW work.
    if (_use_dw_pallas() and kd == 3
            and os.environ.get("WDNO_DW_NATIVE") == "1"):
        from .conv_dw_pallas import conv_dw_fused, pick_nb

        if pick_nb(b * f, h, w, ci, 3 * co, kh, kw, x.dtype.itemsize,
                   fuse_co=co) >= 2:
            if os.environ.get("WDNO_DW_DEBUG"):
                print(f"[dw] native site x={x.shape} co={co}", flush=True)
            dk2 = conv_dw_fused(x.reshape(b * f, h, w, ci),
                                g.reshape(b * f, h, w, co), kh=kh, kw=kw, f=f)
    if dk2 is not None:
        dk = dk2.reshape(kh, kw, ci, kd, co).transpose(3, 0, 1, 2, 4)
    else:
        _, vjp_k = jax.vjp(lambda kk: _conv3d_native(x, kk), k)
        dk, = vjp_k(g)
    dbias = g.sum(axis=(0, 1, 2, 3)) if has_bias else None
    return dx, dk, dbias


native_conv3d_pdw.defvjp(_ncp_fwd, _ncp_bwd)
