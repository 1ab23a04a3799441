"""Fused Pallas TPU multi-head attention for short sequences.

The smoke denoiser attends over F<=32 frames at every spatial site and over
<=1600 sites at the bottleneck (reference ``conv3d.py:277-353``).  XLA
materializes the per-head score tensors ``[N, h, F, F]`` in HBM, where the
tiny trailing dims land on the (8,128) tiled layout with 4-5.3x padding —
measured ~48% of the whole train step going to padded-layout copies.

This kernel keeps the entire softmax(q k^T + bias) v chain in VMEM: one HBM
read of q/k/v ``[N, S, h*d]`` (h*d = 128 = exactly one lane tile), one HBM
write of the output, nothing else.  The backward pass is the standard
flash-style recompute, also fused, accumulating the bias gradient across the
(sequential) TPU grid.  Measured ~10x over the XLA lowering for the
temporal-attention shape [9600, 24, 4x32] on a v5e chip.

Heads are looped statically inside the kernel; the per-head contractions are
batched ``dot_general``s over the site-block dimension, which Mosaic lowers
natively.  Scale and rotary embeddings are applied by the caller (they fuse
into the qkv projection epilogue and differentiate for free).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attention", "fused_linear_attention", "temporal_attention_native"]


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _pick_block(n: int, s: int, c: int, n_io: int, n_scores: int,
                budget_bytes: int = 9 * 1024 * 1024) -> int:
    """Site-block size under a VMEM budget: ``n_io`` double-buffered bf16
    [NB, S, C] blocks + ``n_scores`` f32 [NB, S, S] intermediates + per-head
    f32 staging; multiple of 8, and must divide ``n`` (n is pre-padded)."""
    per_site = n_io * 2 * s * c * 2 + n_scores * s * s * 4 + n_io * s * 32 * 4
    nb = max(8, min(128, budget_bytes // max(per_site, 1)))
    nb = (nb // 8) * 8
    while n % nb:
        nb -= 8
        if nb <= 8:
            return 8
    return nb


def _fwd_block(n: int, s: int, c: int) -> int:
    return _pick_block(n, s, c, n_io=4, n_scores=3)


def _bwd_block(n: int, s: int, c: int) -> int:
    return _pick_block(n, s, c, n_io=7, n_scores=5)


def _fwd_kernel(heads, q_ref, k_ref, v_ref, b_ref, o_ref):
    D = q_ref.shape[-1] // heads
    for h in range(heads):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, :, sl].astype(jnp.float32)
        k = k_ref[:, :, sl].astype(jnp.float32)
        v = v_ref[:, :, sl].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = s + b_ref[h][None]
        s = s - s.max(-1, keepdims=True)
        p = jnp.exp(s)
        p = p / p.sum(-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def _bwd_kernel(heads, q_ref, k_ref, v_ref, b_ref, g_ref, dq_ref, dk_ref, dv_ref, db_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        db_ref[:] = jnp.zeros_like(db_ref)

    D = q_ref.shape[-1] // heads
    for h in range(heads):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, :, sl].astype(jnp.float32)
        k = k_ref[:, :, sl].astype(jnp.float32)
        v = v_ref[:, :, sl].astype(jnp.float32)
        g = g_ref[:, :, sl].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = s + b_ref[h][None]
        s = s - s.max(-1, keepdims=True)
        p = jnp.exp(s)
        p = p / p.sum(-1, keepdims=True)
        # dv[n,g,d] = sum_f p[n,f,g] g[n,f,d]
        dv = jax.lax.dot_general(
            p, g, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # dp[n,f,g] = sum_d g[n,f,d] v[n,g,d]
        dp = jax.lax.dot_general(
            g, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        ds = p * (dp - (dp * p).sum(-1, keepdims=True))
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # dk[n,g,d] = sum_f ds[n,f,g] q[n,f,d]
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)
        db_ref[h] = db_ref[h] + ds.sum(0)


def _site_spec(nb, s, c):
    return pl.BlockSpec((nb, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _bias_spec(heads, s):
    return pl.BlockSpec((heads, s, s), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)


def _fwd_call(heads, q, k, v, bias):
    n, s, c = q.shape
    nb = _fwd_block(n, s, c)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads),
        grid=(n // nb,),
        in_specs=[_site_spec(nb, s, c)] * 3 + [_bias_spec(heads, s)],
        out_specs=_site_spec(nb, s, c),
        out_shape=jax.ShapeDtypeStruct((n, s, c), q.dtype),
        interpret=not _on_tpu(),
    )(q, k, v, bias)


def _bwd_call(heads, q, k, v, bias, g):
    n, s, c = q.shape
    nb = _bwd_block(n, s, c)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, heads),
        grid=(n // nb,),
        in_specs=[_site_spec(nb, s, c)] * 3 + [_bias_spec(heads, s), _site_spec(nb, s, c)],
        out_specs=[_site_spec(nb, s, c)] * 3 + [_bias_spec(heads, s)],
        out_shape=[
            jax.ShapeDtypeStruct((n, s, c), q.dtype),
            jax.ShapeDtypeStruct((n, s, c), k.dtype),
            jax.ShapeDtypeStruct((n, s, c), v.dtype),
            jax.ShapeDtypeStruct((heads, s, s), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)  # db accumulates across steps
        ),
        interpret=not _on_tpu(),
    )(q, k, v, bias, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_attention(heads, q, k, v, bias):
    return _fwd_call(heads, q, k, v, bias)


def _fa_fwd(heads, q, k, v, bias):
    return _fwd_call(heads, q, k, v, bias), (q, k, v, bias)


def _fa_bwd(heads, res, g):
    q, k, v, bias = res
    dq, dk, dv, db = _bwd_call(heads, q, k, v, bias, g)
    return dq, dk, dv, db.astype(bias.dtype)


_fused_attention.defvjp(_fa_fwd, _fa_bwd)


# ---------------------------------------------------------------------------
# Native-layout temporal attention
#
# The video denoiser's temporal attention (reference ``conv3d.py:383,443``)
# attends over the F frames at every spatial site.  The einsum formulation
# needs the state transposed 'b f h w c -> b (h w) f c' and back — at the
# full-resolution levels those two copies plus the rotary/scale passes cost
# more than the attention itself (r2 profile: ~28 ms/step of the 147 ms
# bench step was attention-adjacent layout/elementwise).  This kernel reads
# the packed qkv projection IN ITS NATIVE [B, F, H, W, 3*hd] layout (one
# strided DMA per (batch, H-row) block), applies scale+rotary+bias+softmax
# in VMEM, and writes the output back in native layout: one HBM read and one
# HBM write, no transposes ever materialized.
#
# Rotary is applied as ``x*cos + (x@R)*sin`` where R is the constant
# antisymmetric pair-swap matrix (R[2i+1,2i]=-1, R[2i,2i+1]=+1, tiled per
# head) — the interleaved-pair rotation becomes one 128x128 MXU op instead
# of a lane-shuffling reshape.  The query scale is folded into its cos/sin
# tables.  R^T = -R, which the backward uses to un-rotate gradients.


def _rot_tables(f: int, heads: int, d: int, scale: float, theta: float):
    """cos/sin [F, heads*d] tables (q tables carry the scale) + R [hd, hd]."""
    import numpy as np

    half = d // 2
    freqs = 1.0 / (theta ** (np.arange(half) / half))
    pos = np.arange(f)[:, None] * freqs[None, :]  # [F, half]
    cos = np.tile(np.repeat(np.cos(pos), 2, axis=-1), (1, heads))
    sin = np.tile(np.repeat(np.sin(pos), 2, axis=-1), (1, heads))
    hd = heads * d
    r = np.zeros((hd, hd), np.float32)
    idx = np.arange(hd // 2)
    r[2 * idx + 1, 2 * idx] = -1.0
    r[2 * idx, 2 * idx + 1] = 1.0
    return (cos.astype(np.float32), sin.astype(np.float32),
            (cos * scale).astype(np.float32), (sin * scale).astype(np.float32), r)


def _rotate(x, cos, sin, r):
    """x: [S, F, hd]; cos/sin: [F, hd]; r: [hd, hd]; all in x.dtype
    (the MXU accumulator is always f32; results are cast back)."""
    xr = jax.lax.dot_general(
        x, r, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return x * cos[None] + xr * sin[None]


def _unrotate(g, cos, sin, r):
    """VJP of :func:`_rotate` wrt x (R^T = -R)."""
    gr = jax.lax.dot_general(
        g * sin[None], r, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)
    return g * cos[None] - gr


def _site_group(s: int, f: int, cap: int = 160) -> int:
    """Site grouping factor (pinned to 1 — see _tan_fwd_kernel note)."""
    del s, f, cap
    return 1


# Site-grouped attention: instead of one tiny [F, D] x [D, F] matmul per
# spatial site (160 MXU dispatches per block — measured launch-bound at
# ~11 us/block), G sites are packed into one [F*G, D] x [D, F*G] matmul
# whose cross-site logits are killed by a Kronecker mask folded into the
# bias: mb[h] = kron(bias[h], I_G) - BIG * (1 - kron(1_FxF, I_G)).  Rows
# are f-major (row = f*G + s), which is exactly the contiguous reshape of
# a [F, G, D] slice — no in-kernel transposes at all.


def _tan_fwd_kernel(heads, G, qkv_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                    r_ref, mb_ref, o_ref):
    # One [F, S] -> [S, F] transpose on entry and exit; per-head batched
    # dots over the S sites (Mosaic requires batch dims at position 0).
    # Everything is promoted to f32 once at load: bf16 VMEM ops use the
    # (16, 128) packed tiling, and the per-head slices/batched dots then
    # relayout constantly — measured 3.1 ms bf16 vs 2.7 ms f32 at the bench
    # shape.  A site-grouped variant (G sites per masked matmul) also
    # measured slower (4.05 ms): the group reshape/concat relayouts cost
    # more than the larger matmuls save, so G is pinned to 1.
    del G
    blk = qkv_ref[0, :, 0, :, :].astype(jnp.float32).swapaxes(0, 1)  # [S,F,3hd]
    hd = o_ref.shape[-1]
    dt = blk.dtype
    r = r_ref[...].astype(dt)
    cq, sq = cq_ref[...].astype(dt), sq_ref[...].astype(dt)
    ck, sk = ck_ref[...].astype(dt), sk_ref[...].astype(dt)
    q = _rotate(blk[..., :hd], cq, sq, r)
    k = _rotate(blk[..., hd:2 * hd], ck, sk, r)
    v = blk[..., 2 * hd:]
    D = hd // heads
    outs = []
    for h in range(heads):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s + mb_ref[h][None]
        s = s - s.max(-1, keepdims=True)
        p = jnp.exp(s)
        p = (p / p.sum(-1, keepdims=True)).astype(dt)
        o = jax.lax.dot_general(
            p, v[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(o.astype(dt))
    o = jnp.concatenate(outs, axis=-1)  # [S, F, hd]
    o_ref[0, :, 0, :, :] = o.swapaxes(0, 1).astype(o_ref.dtype)


def _tan_bwd_kernel(heads, G, qkv_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                    r_ref, mb_ref, g_ref, dqkv_ref, db_ref):
    del G
    i0 = pl.program_id(0)

    @pl.when(i0 == 0)
    def _():
        db_ref[:] = jnp.zeros_like(db_ref)

    blk = qkv_ref[0, :, 0, :, :].astype(jnp.float32).swapaxes(0, 1)  # [S,F,3hd]
    hd = g_ref.shape[-1]
    dt = blk.dtype
    r = r_ref[...].astype(dt)
    cq, sq = cq_ref[...].astype(dt), sq_ref[...].astype(dt)
    ck, sk = ck_ref[...].astype(dt), sk_ref[...].astype(dt)
    q = _rotate(blk[..., :hd], cq, sq, r)
    k = _rotate(blk[..., hd:2 * hd], ck, sk, r)
    v = blk[..., 2 * hd:]
    gout = g_ref[0, :, 0, :, :].astype(jnp.float32).swapaxes(0, 1)  # [S, F, hd]
    D = hd // heads
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * D, (h + 1) * D)
        qh, kh, vh, gh = (t[:, :, sl] for t in (q, k, v, gout))
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s + mb_ref[h][None]
        s = s - s.max(-1, keepdims=True)
        p = jnp.exp(s)
        p = p / p.sum(-1, keepdims=True)  # f32 [S, F, F]
        pb = p.astype(dt)
        # dv[s, g, d] = sum_f p[s, f, g] gout[s, f, d]
        dv = jax.lax.dot_general(
            pb, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dp[s, f, g] = sum_d gout[s, f, d] v[s, g, d]
        dp = jax.lax.dot_general(
            gh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - (dp * p).sum(-1, keepdims=True))
        dsb = ds.astype(dt)
        dq = jax.lax.dot_general(
            dsb, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            dsb, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqs.append(dq.astype(dt))
        dks.append(dk.astype(dt))
        dvs.append(dv.astype(dt))
        db_ref[h] = db_ref[h] + ds.sum(0)
    dq = _unrotate(jnp.concatenate(dqs, -1), cq, sq, r)
    dk = _unrotate(jnp.concatenate(dks, -1), ck, sk, r)
    dv = jnp.concatenate(dvs, -1)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1).swapaxes(0, 1)
    dqkv_ref[0, :, 0, :, :] = dqkv.astype(dqkv_ref.dtype)


_MASK_BIG = 1e30


def _use_head_group() -> bool:
    """Head-grouped score matmuls (WDNO_TAN_HG=1): all ``heads`` per-head
    [F, D] x [D, F] dots become ONE [heads*F, hd] x [hd, heads*F] dot whose
    cross-head blocks vanish because the operands' lanes are masked per head
    (disjoint lane sets -> zero dot) and the bias carries -BIG off-block.
    Trades ``heads``x arithmetic waste for ``heads``x fewer (and much
    better-shaped) MXU dispatches.

    Measured at the bench shape [6,24,40,40,384] on TPU v5e
    (benchmarks/tan_bench.py): fwd 2.96 ms vs 2.27, fwd+bwd 6.89 vs 5.34 —
    the block-diag operand construction (row broadcast + lane mask + the 4x
    larger softmax arrays) costs more than the small-dot dispatches it
    saves, the same verdict as r2's site-grouping attempt.  Kept as the
    measured alternative; default stays per-head (G=1)."""
    return os.environ.get("WDNO_TAN_HG", "0") == "1"


def _hg_tables(heads: int, f: int, hd: int):
    """Row mask [heads*F, hd] (block h rows keep only head h's lanes) and
    the block-diagonal bias scaffold mask [heads*F, heads*F]."""
    import numpy as np

    d = hd // heads
    rows = np.zeros((heads * f, hd), np.float32)
    for h in range(heads):
        rows[h * f:(h + 1) * f, h * d:(h + 1) * d] = 1.0
    return rows


def _hg_bias(bias, f):
    """[heads, F, F] -> [heads*F, heads*F] block-diag with -BIG off-block."""
    heads = bias.shape[0]
    blocks = sum(
        jnp.pad(bias[h], ((h * f, (heads - 1 - h) * f),
                          (h * f, (heads - 1 - h) * f)))
        for h in range(heads)
    )
    onb = sum(
        jnp.pad(jnp.ones((f, f), bias.dtype),
                ((h * f, (heads - 1 - h) * f), (h * f, (heads - 1 - h) * f)))
        for h in range(heads)
    )
    return blocks - _MASK_BIG * (1.0 - onb)


def _hg_fwd_kernel(heads, qkv_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                   r_ref, rows_ref, mb_ref, o_ref):
    blk = qkv_ref[0, :, 0, :, :].swapaxes(0, 1)  # [S, F, 3hd] (input dtype)
    hd = o_ref.shape[-1]
    f = blk.shape[1]
    dt = blk.dtype
    r = r_ref[...].astype(dt)
    cq, sq = cq_ref[...].astype(dt), sq_ref[...].astype(dt)
    ck, sk = ck_ref[...].astype(dt), sk_ref[...].astype(dt)
    rows = rows_ref[...].astype(dt)  # [heads*F, hd]
    q = _rotate(blk[..., :hd].astype(dt), cq, sq, r)
    k = _rotate(blk[..., hd:2 * hd].astype(dt), ck, sk, r)
    v = blk[..., 2 * hd:]

    def bd(x):  # [S, F, hd] -> [S, heads*F, hd], rows lane-masked per head
        s = x.shape[0]
        xt = jnp.broadcast_to(x[:, None], (s, heads) + x.shape[1:])
        return xt.reshape(s, heads * f, hd) * rows[None]

    qb, kb, vb = bd(q), bd(k), bd(v)
    sc = jax.lax.dot_general(
        qb, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [S, hF, hF]
    sc = sc + mb_ref[...][None]
    sc = sc - sc.max(-1, keepdims=True)
    p = jnp.exp(sc)
    p = (p / p.sum(-1, keepdims=True)).astype(dt)
    ob = jax.lax.dot_general(
        p, vb, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [S, hF, hd]; block h rows live only in head-h lanes
    o = ob.reshape(ob.shape[0], heads, f, hd).sum(1)
    o_ref[0, :, 0, :, :] = o.swapaxes(0, 1).astype(o_ref.dtype)


def _hg_bwd_kernel(heads, qkv_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                   r_ref, rows_ref, mb_ref, g_ref, dqkv_ref, db_ref):
    i0 = pl.program_id(0)

    @pl.when(i0 == 0)
    def _():
        db_ref[:] = jnp.zeros_like(db_ref)

    blk = qkv_ref[0, :, 0, :, :].swapaxes(0, 1)
    hd = g_ref.shape[-1]
    f = blk.shape[1]
    dt = blk.dtype
    r = r_ref[...].astype(dt)
    cq, sq = cq_ref[...].astype(dt), sq_ref[...].astype(dt)
    ck, sk = ck_ref[...].astype(dt), sk_ref[...].astype(dt)
    rows = rows_ref[...].astype(dt)
    q = _rotate(blk[..., :hd].astype(dt), cq, sq, r)
    k = _rotate(blk[..., hd:2 * hd].astype(dt), ck, sk, r)
    v = blk[..., 2 * hd:]
    gout = g_ref[0, :, 0, :, :].swapaxes(0, 1)  # [S, F, hd]

    def bd(x):
        s = x.shape[0]
        xt = jnp.broadcast_to(x[:, None], (s, heads) + x.shape[1:])
        return xt.reshape(s, heads * f, hd) * rows[None]

    def unbd(xb):  # [S, hF, hd] -> [S, F, hd] (blocks live in disjoint lanes)
        return xb.reshape(xb.shape[0], heads, f, hd).sum(1)

    qb, kb, vb, gb = bd(q), bd(k), bd(v), bd(gout.astype(dt))
    sc = jax.lax.dot_general(
        qb, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    sc = sc + mb_ref[...][None]
    sc = sc - sc.max(-1, keepdims=True)
    p = jnp.exp(sc)
    p = p / p.sum(-1, keepdims=True)  # f32 [S, hF, hF]
    pb = p.astype(dt)
    dv = unbd(jax.lax.dot_general(
        pb, gb, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dt))
    dp = jax.lax.dot_general(
        gb, vb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    ds = p * (dp - (dp * p).sum(-1, keepdims=True))
    dsb = ds.astype(dt)
    dq = unbd(jax.lax.dot_general(
        dsb, kb, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dt))
    dk = unbd(jax.lax.dot_general(
        dsb, qb, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dt))
    db_ref[:] = db_ref[:] + ds.sum(0)
    dq = _unrotate(dq, cq, sq, r)
    dk = _unrotate(dk, ck, sk, r)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1).swapaxes(0, 1)
    dqkv_ref[0, :, 0, :, :] = dqkv.astype(dqkv_ref.dtype)


def _kron_bias(bias, G):
    """[heads, F, F] -> [heads, G*F, G*F] block-diag mask-bias: rows are
    s-major (row = s*F + f), so kron(I_G, bias[h]) with -BIG on every
    cross-site entry."""
    heads, f, _ = bias.shape
    eye = jnp.eye(G, dtype=bias.dtype)
    mb = jnp.einsum("st,hfg->hsftg", eye, bias).reshape(heads, G * f, G * f)
    hole = jnp.kron(eye, jnp.ones((f, f), bias.dtype))
    return mb - _MASK_BIG * (1.0 - hole)[None]


def _unkron_db(db_big, f, G):
    """Transpose of :func:`_kron_bias` wrt bias: sum the diagonal blocks."""
    heads = db_big.shape[0]
    resh = db_big.reshape(heads, G, f, G, f)
    return jnp.einsum("hsfsg->hfg", resh)


def _tan_specs(b, f, h, w, hd3, hd, heads, G):
    grid = (b * h,)  # one full (frames x W-row) block per step

    def qkv_idx(i):
        return (i // h, 0, i % h, 0, 0)

    tab = lambda: pl.BlockSpec((f, hd), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return grid, [
        pl.BlockSpec((1, f, 1, w, hd3), qkv_idx, memory_space=pltpu.VMEM),
        tab(), tab(), tab(), tab(),
        pl.BlockSpec((hd, hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, f * G, f * G), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ], pl.BlockSpec((1, f, 1, w, hd), qkv_idx, memory_space=pltpu.VMEM)


def _tan_fwd_call(heads, qkv, mb, tabs, G):
    b, f, h, w, hd3 = qkv.shape
    hd = hd3 // 3
    grid, in_specs, o_spec = _tan_specs(b, f, h, w, hd3, hd, heads, G)
    return pl.pallas_call(
        functools.partial(_tan_fwd_kernel, heads, G),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, f, h, w, hd), qkv.dtype),
        interpret=not _on_tpu(),
    )(qkv, *tabs, mb)


def _tan_bwd_call(heads, qkv, mb, tabs, g, G):
    b, f, h, w, hd3 = qkv.shape
    hd = hd3 // 3
    grid, in_specs, o_spec = _tan_specs(b, f, h, w, hd3, hd, heads, G)
    g_spec = o_spec
    dqkv, db_big = pl.pallas_call(
        functools.partial(_tan_bwd_kernel, heads, G),
        grid=grid,
        in_specs=in_specs + [g_spec],
        out_specs=[in_specs[0], in_specs[-1]],
        out_shape=[
            jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
            jax.ShapeDtypeStruct((heads, f * G, f * G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)  # db accumulates across steps
        ),
        interpret=not _on_tpu(),
    )(qkv, *tabs, mb, g)
    return dqkv, db_big


def _hg_specs(b, f, h, w, hd3, hd, heads):
    grid = (b * h,)

    def qkv_idx(i):
        return (i // h, 0, i % h, 0, 0)

    tab = lambda: pl.BlockSpec((f, hd), lambda i: (0, 0), memory_space=pltpu.VMEM)
    hf = heads * f
    return grid, [
        pl.BlockSpec((1, f, 1, w, hd3), qkv_idx, memory_space=pltpu.VMEM),
        tab(), tab(), tab(), tab(),
        pl.BlockSpec((hd, hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hf, hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hf, hf), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ], pl.BlockSpec((1, f, 1, w, hd), qkv_idx, memory_space=pltpu.VMEM)


def _hg_fwd_call(heads, qkv, bias, tabs):
    b, f, h, w, hd3 = qkv.shape
    hd = hd3 // 3
    grid, in_specs, o_spec = _hg_specs(b, f, h, w, hd3, hd, heads)
    rows = jnp.asarray(_hg_tables(heads, f, hd))
    return pl.pallas_call(
        functools.partial(_hg_fwd_kernel, heads),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, f, h, w, hd), qkv.dtype),
        interpret=not _on_tpu(),
    )(qkv, *tabs, rows, _hg_bias(bias, f))


def _hg_bwd_call(heads, qkv, bias, tabs, g):
    b, f, h, w, hd3 = qkv.shape
    hd = hd3 // 3
    grid, in_specs, o_spec = _hg_specs(b, f, h, w, hd3, hd, heads)
    rows = jnp.asarray(_hg_tables(heads, f, hd))
    hf = heads * f
    dqkv, db_big = pl.pallas_call(
        functools.partial(_hg_bwd_kernel, heads),
        grid=grid,
        in_specs=in_specs + [o_spec],
        out_specs=[in_specs[0],
                   pl.BlockSpec((hf, hf), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
            jax.ShapeDtypeStruct((hf, hf), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)  # db accumulates across steps
        ),
        interpret=not _on_tpu(),
    )(qkv, *tabs, rows, _hg_bias(bias, f), g)
    # diag blocks of [hF, hF] -> [heads, F, F]
    db = jnp.stack([db_big[i * f:(i + 1) * f, i * f:(i + 1) * f]
                    for i in range(heads)])
    return dqkv, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _tan(heads, dim_head, theta_scale, qkv, bias):
    theta, scale = theta_scale
    f, w = qkv.shape[1], qkv.shape[3]
    tabs = [jnp.asarray(t) for t in
            _tan_tables_cached(f, heads, dim_head, scale, theta)]
    if _use_head_group():
        return _hg_fwd_call(heads, qkv, bias, tabs)
    G = _site_group(w, f)
    return _tan_fwd_call(heads, qkv, _kron_bias(bias, G), tabs, G)


@functools.lru_cache(maxsize=32)
def _tan_tables_cached(f, heads, d, scale, theta):
    cos, sin, cosq, sinq, r = _rot_tables(f, heads, d, scale, theta)
    return (cosq, sinq, cos, sin, r)


def _tan_fwd(heads, dim_head, theta_scale, qkv, bias):
    return _tan(heads, dim_head, theta_scale, qkv, bias), (qkv, bias)


def _tan_bwd(heads, dim_head, theta_scale, res, g):
    qkv, bias = res
    theta, scale = theta_scale
    f, w = qkv.shape[1], qkv.shape[3]
    tabs = [jnp.asarray(t) for t in
            _tan_tables_cached(f, heads, dim_head, scale, theta)]
    if _use_head_group():
        dqkv, db = _hg_bwd_call(heads, qkv, bias, tabs, g)
        return dqkv, db.astype(bias.dtype)
    G = _site_group(w, f)
    dqkv, db_big = _tan_bwd_call(heads, qkv, _kron_bias(bias, G), tabs, g, G)
    return dqkv, _unkron_db(db_big, f, G).astype(bias.dtype)


_tan.defvjp(_tan_fwd, _tan_bwd)


def temporal_attention_native(qkv, bias, *, heads: int, dim_head: int,
                              scale: float, theta: float = 10000.0):
    """Frame attention on native-video-layout packed qkv.

    qkv: ``[B, F, H, W, 3*heads*dim_head]`` (the packed projection, untouched
    — scale and interleaved rotary are applied inside the kernel); bias:
    ``[heads, F, F]`` additive logits (differentiable).  Returns
    ``[B, F, H, W, heads*dim_head]``.  Equivalent to transposing to
    ``[B*H*W, F, hd]``, applying ``apply_rotary_packed`` to scaled q / k and
    :func:`fused_attention` — without any HBM transpose.  Returns ``None``
    when a (frames x W-row) block would not fit VMEM (caller falls back).
    """
    b, f, h, w, hd3 = qkv.shape
    hd = hd3 // 3
    assert hd == heads * dim_head and dim_head % 2 == 0
    # bwd working set: qkv/g/dqkv blocks + kron'd bias + score temps
    G = _site_group(w, f)
    itemsize = jnp.dtype(qkv.dtype).itemsize
    vmem = (f * w * hd3 * itemsize) * 5 + (heads + 6) * (f * G) ** 2 * 4
    if vmem > 10 * 1024 * 1024:
        return None
    return _tan(heads, dim_head, (theta, scale), qkv,
                bias.astype(jnp.float32))


def _lin_fwd_kernel(heads, scale, q_ref, k_ref, v_ref, o_ref):
    # All per-head temps live transposed as [MB, d, N] — lanes on the long
    # site axis N, so nothing in VMEM is padded (d=32 would waste 4x lanes).
    D = q_ref.shape[-1] // heads
    for h in range(heads):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, :, sl].astype(jnp.float32).swapaxes(1, 2)
        k = k_ref[:, :, sl].astype(jnp.float32).swapaxes(1, 2)
        v = v_ref[:, :, sl].astype(jnp.float32).swapaxes(1, 2)
        qs = jax.nn.softmax(q, axis=1) * scale  # softmax over d
        ks = jax.nn.softmax(k, axis=2)  # softmax over sites
        # ctx[m,d,e] = sum_n ks[m,d,n] v[m,e,n]
        ctx = jax.lax.dot_general(
            ks, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # o[m,e,n] = sum_d ctx[m,d,e] qs[m,d,n]
        o = jax.lax.dot_general(
            ctx, qs, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        o_ref[:, :, sl] = o.swapaxes(1, 2).astype(o_ref.dtype)


def _lin_bwd_kernel(heads, scale, q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
    D = q_ref.shape[-1] // heads
    for h in range(heads):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, :, sl].astype(jnp.float32).swapaxes(1, 2)
        k = k_ref[:, :, sl].astype(jnp.float32).swapaxes(1, 2)
        v = v_ref[:, :, sl].astype(jnp.float32).swapaxes(1, 2)
        g = g_ref[:, :, sl].astype(jnp.float32).swapaxes(1, 2)
        sm = jax.nn.softmax(q, axis=1)
        qs = sm * scale
        ks = jax.nn.softmax(k, axis=2)
        ctx = jax.lax.dot_general(
            ks, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # dctx[m,d,e] = sum_n qs[m,d,n] g[m,e,n]
        dctx = jax.lax.dot_general(
            qs, g, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # dqs[m,d,n] = sum_e ctx[m,d,e] g[m,e,n]
        dqs = jax.lax.dot_general(
            ctx, g, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # dv[m,e,n] = sum_d dctx[m,d,e] ks[m,d,n]
        dv = jax.lax.dot_general(
            dctx, ks, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # dks[m,d,n] = sum_e dctx[m,d,e] v[m,e,n]
        dks = jax.lax.dot_general(
            dctx, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dsm = dqs * scale
        dq = sm * (dsm - (dsm * sm).sum(axis=1, keepdims=True))
        dk = ks * (dks - (dks * ks).sum(axis=2, keepdims=True))
        dq_ref[:, :, sl] = dq.swapaxes(1, 2).astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.swapaxes(1, 2).astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.swapaxes(1, 2).astype(dv_ref.dtype)


def _lin_block(m: int, n: int, c: int, n_io: int, budget: int = 9 * 1024 * 1024) -> int:
    # io blocks are double-buffered bf16 [MB, N, C]; transposed f32 temps are
    # ~8 live [MB, 32, N] arrays plus transient padded slice reads.
    per_row = n_io * 2 * n * c * 2 + 8 * n * 32 * 4 + 2 * n * 128 * 4
    mb = max(1, min(8, budget // max(per_row, 1)))
    while m % mb:
        mb -= 1
    return mb


def _lin_fwd_call(heads, scale, q, k, v):
    m, n, c = q.shape
    mb = _lin_block(m, n, c, 4)
    spec = lambda: pl.BlockSpec((mb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lin_fwd_kernel, heads, scale),
        grid=(m // mb,),
        in_specs=[spec()] * 3,
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((m, n, c), q.dtype),
        interpret=not _on_tpu(),
    )(q, k, v)


def _lin_bwd_call(heads, scale, q, k, v, g):
    m, n, c = q.shape
    mb = _lin_block(m, n, c, 7)
    spec = lambda: pl.BlockSpec((mb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lin_bwd_kernel, heads, scale),
        grid=(m // mb,),
        in_specs=[spec()] * 4,
        out_specs=[spec()] * 3,
        out_shape=[jax.ShapeDtypeStruct((m, n, c), t.dtype) for t in (q, k, v)],
        interpret=not _on_tpu(),
    )(q, k, v, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_linear_attention(heads, scale, q, k, v):
    return _lin_fwd_call(heads, scale, q, k, v)


def _fla_fwd(heads, scale, q, k, v):
    return _lin_fwd_call(heads, scale, q, k, v), (q, k, v)


def _fla_bwd(heads, scale, res, g):
    return _lin_bwd_call(heads, scale, *res, g)


_fused_linear_attention.defvjp(_fla_fwd, _fla_bwd)


def fused_linear_attention(q, k, v, *, heads: int, scale: float):
    """Linear attention ``(softmax_d(q)·scale) @ (softmax_n(k)^T v)`` per
    head, fused in VMEM (reference semantics ``unet.py:183-223`` /
    ``conv3d.py:232-258``).  q/k/v: ``[M, N, heads*d]``.

    The O(N d^2) contraction never materializes padded per-head tensors in
    HBM.  Falls back to ``None`` (caller should use the XLA path) when one
    row of sites exceeds the VMEM budget.
    """
    m, n, c = q.shape
    if 7 * 2 * n * c * 2 > 12 * 1024 * 1024:  # bwd block would not fit VMEM
        return None
    return _fused_linear_attention(heads, scale, q, k, v)


def fused_attention(q, k, v, bias=None, *, heads: int):
    """softmax(q k^T + bias) v per head, fused in VMEM.

    q/k/v: ``[N, S, heads*dim_head]`` with pre-applied scaling/rotary;
    bias: optional ``[heads, S, S]`` additive logits (differentiable).
    Returns ``[N, S, heads*dim_head]`` in the dtype of ``q``.
    """
    n, s, c = q.shape
    assert c % heads == 0, (c, heads)
    # Short-sequence kernel: the whole [NB, S, S] score block must fit VMEM
    # (even at NB=8).  For longer sequences return None — the caller uses the
    # XLA einsum path, which is fine there (scores are large enough that the
    # (8,128) tile padding stops mattering).
    if 8 * s * s * 4 * 5 > 8 * 1024 * 1024:
        return None
    if bias is None:
        bias = jnp.zeros((heads, s, s), jnp.float32)
    # pad the site dim to a multiple of the block size
    nb = _fwd_block(max(n, 8), s, c)
    pad = (-n) % max(nb, 8)
    if pad:
        zeros = jnp.zeros((pad, s, c), q.dtype)
        q, k, v = (jnp.concatenate([y, zeros], 0) for y in (q, k, v))
    out = _fused_attention(heads, q, k, v, bias.astype(jnp.float32))
    return out[:n] if pad else out
