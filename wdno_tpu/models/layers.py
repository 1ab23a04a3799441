"""Shared flax building blocks for the denoiser U-Nets.

Channels-last (TPU-native) re-design of the reference's torch modules
(``burgers/ddpm_burgers/unet.py:18-259``,
``smoke/video_diffusion_pytorch/video_diffusion_pytorch_conv3d.py:74-353``):
GroupNorm+SiLU resnet blocks with FiLM time conditioning, linear and full
attention, sinusoidal time embeddings, rotary embeddings and bucketed
relative position bias for temporal attention.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jnp.ndarray
Dtype = Any


def sinusoidal_pos_emb(t: Array, dim: int, theta: float = 10000.0) -> Array:
    """[B] timesteps -> [B, dim] embedding (reference ``unet.py:82-108``)."""
    half = dim // 2
    emb = math.log(theta) / (half - 1)
    freqs = jnp.exp(jnp.arange(half) * -emb)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimeMLP(nn.Module):
    """Sinusoidal embedding -> Dense -> GELU -> Dense (reference ``unet.py:301-306``)."""

    dim: int
    time_dim: int
    theta: float = 10000.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: Array) -> Array:
        x = sinusoidal_pos_emb(t, self.dim, self.theta)
        x = nn.Dense(self.time_dim, dtype=self.dtype)(x)
        # exact (erf) gelu: torch nn.GELU() default; jax defaults to the tanh
        # approximation, which costs ~6e-5 absolute vs the reference
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.time_dim, dtype=self.dtype)(x)


class ChannelLayerNorm(nn.Module):
    """Bias-free LayerNorm over the channel axis (reference ``unet.py:55-65``)."""

    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = self.param("g", nn.initializers.ones, (x.shape[-1],))
        # stats at f32 minimum (bf16-safe), but keep f64 inputs at f64 so
        # double-precision parity probes aren't noise-floored by the norm
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        mean = xf.mean(axis=-1, keepdims=True)
        var = xf.var(axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps) * g
        return out.astype(self.dtype)


class TemporalDecompConv3d(nn.Module):
    """3D conv with two equivalent lowerings, selected at trace time.

    Default: XLA's native conv3d — measured fastest for the full train step
    on TPU v5e (6.44 vs 6.12 steps/s at the smoke base config).  Set
    ``WDNO_DECOMP_CONV3D=1`` for the batched-2D decomposition: fold F into
    the batch, run ONE 2D conv producing kd*features channels (all temporal
    taps at once on the MXU), then sum the taps with static temporal shifts
        o[f] = sum_dt y[f + dt - kd//2, ..., tap dt]
    — it wins on forward-only micro-benchmarks but not end-to-end, and is
    kept for other geometries/backends.

    Parameter shape/naming is identical to ``nn.Conv`` with a (kd, kh, kw)
    kernel, so checkpoints and the torch converter are unaffected.
    Temporal stride must be 1 (true everywhere in the reference model;
    spatial strides are supported).
    """

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import os as _os

        kd, kh, kw = self.kernel_size
        assert self.strides[0] == 1, "temporal stride must be 1"
        b, f, hh, ww, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=-2, out_axis=-1),
            (kd, kh, kw, c, self.features),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))

        # Lowering A/B history (bench.py, TPU v5e, smoke base config):
        # native 6.50, large-k 6.77, full decomp 6.18, narrow 6.83 steps/s.
        # Default "vjp": the packed custom-VJP decomposition
        # (ops/conv3d_packed.py) for every stride-1 odd temporal conv that
        # native conv3d lowers badly (<128 output channels half-fill the MXU
        # lanes: 31-51 TF/s measured, vs ~120 for the packed form) plus the
        # huge-FLOP 7^3 init conv; plain-AD variants ("1"/"narrow"/"large-k")
        # kept for A/B, "0" forces native conv3d everywhere.
        # (the 7^3 init conv keeps the plain-AD large-k path: its packed
        # weight-grad measured 5.1 ms vs 3.9 plain at the bench config)
        env = _os.environ.get("WDNO_DECOMP_CONV3D", "vjp")
        if (
            env in ("vjp", "vjp-all")
            and kd > 1
            and kd < 7
            and (self.features < 128 or env == "vjp-all")
            and self.strides == (1, 1, 1)
            and self.padding == "SAME"
            and kd % 2 == 1
        ):
            from ..ops.conv3d_packed import packed_conv3d

            return packed_conv3d(
                x.astype(self.dtype), jnp.asarray(kernel, self.dtype),
                jnp.asarray(bias, self.dtype) if self.use_bias else None)
        use_decomp = (
            env == "1"
            or (env in ("large-k", "vjp") and kd >= 7)
            or (env == "narrow" and (kd >= 7 or (kd > 1 and self.features < 128)))
        )
        if not use_decomp:
            # native XLA conv3d lowering for fwd/dx; the 3-tap stride-1 SAME
            # convs additionally swap in the Pallas fused-tap weight-grad
            # (ops/conv_dw_pallas.py) — XLA's wgrad is the one slow leg of
            # the native lowering (r2 profile: 50.9 TF/s)
            if (
                kd == 3
                and self.strides == (1, 1, 1)
                and self.padding == "SAME"
                and env != "0"
            ):
                from ..ops.conv3d_packed import native_conv3d_pdw

                return native_conv3d_pdw(
                    x.astype(self.dtype), jnp.asarray(kernel, self.dtype),
                    jnp.asarray(bias, self.dtype) if self.use_bias else None)
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
            pad = self.padding if self.padding == "SAME" else tuple(
                (int(lo), int(hi)) for lo, hi in self.padding)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), jnp.asarray(kernel, self.dtype),
                self.strides, pad, dimension_numbers=dn)
            if self.use_bias:
                y = y + jnp.asarray(bias, self.dtype)
            return y

        if self.padding == "SAME":
            pad2d = "SAME"
        else:  # explicit ((dlo,dhi),(hlo,hhi),(wlo,whi)); temporal handled here
            assert tuple(self.padding[0]) == (0, 0) or kd == 1
            pad2d = tuple(self.padding[1:])

        xf = x.reshape(b * f, hh, ww, c).astype(self.dtype)
        k2 = jnp.transpose(jnp.asarray(kernel, self.dtype), (1, 2, 3, 0, 4))
        k2 = k2.reshape(kh, kw, c, kd * self.features)
        dn = jax.lax.conv_dimension_numbers(xf.shape, k2.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xf, k2, self.strides[1:], pad2d, dimension_numbers=dn
        )
        ho, wo = y.shape[1], y.shape[2]
        # keep the taps packed in the CHANNEL dim (lane-aligned 64-multiple
        # slices) instead of reshaping to a 6D [.., kd, feat] tensor: the 6D
        # view forced XLA into exotic-layout copies costing ~5 ms/step at
        # the bench config (r2 profile, copy pairs around pad_add)
        y = y.reshape(b, f, ho, wo, kd * self.features)
        if kd == 1:
            out = y
        else:
            ctr = kd // 2
            nf = self.features
            # out[:, t] = sum_dt y[:, t + dt - ctr, ..., dt*nf:(dt+1)*nf]
            # with out-of-range frames dropped (zero padding), written as
            # static F-range slice-adds so no padded intermediate or 6D
            # layout is materialized
            out = y[:, :, :, :, ctr * nf : (ctr + 1) * nf]
            for dt in range(kd):
                if dt == ctr:
                    continue
                off = dt - ctr  # out[t] += y[t + off, tap dt]
                # source frames s = t + off for the valid t range
                src = y[:, max(0, off) : f + min(0, off), :, :,
                        dt * nf : (dt + 1) * nf]
                pad_lo = max(0, -off)
                pad_hi = max(0, off)
                out = out + jnp.pad(
                    src, ((0, 0), (pad_lo, pad_hi), (0, 0), (0, 0), (0, 0)))
        if self.use_bias:
            out = out + jnp.asarray(bias, self.dtype)
        return out


class SpatialConvTranspose3d(nn.Module):
    """Spatial-only transposed 3D conv ((1, kh, kw), temporal stride 1) as a
    batched 2D transposed conv over [B*F, H, W, C] — same 4x-class win over
    XLA's conv3d path as :class:`TemporalDecompConv3d`; parameters identical
    to ``nn.ConvTranspose`` with a (1, kh, kw) kernel."""

    features: int
    kernel_size: Tuple[int, int, int] = (1, 4, 4)
    strides: Tuple[int, int, int] = (1, 2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kd, kh, kw = self.kernel_size
        assert kd == 1 and self.strides[0] == 1, "temporal extent must be 1"
        b, f, hh, ww, c = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kd, kh, kw, c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        xf = x.reshape(b * f, hh, ww, c).astype(self.dtype)
        y = jax.lax.conv_transpose(
            xf,
            jnp.asarray(kernel[0], self.dtype),
            self.strides[1:],
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + jnp.asarray(bias, self.dtype)
        return y.reshape(b, f, y.shape[1], y.shape[2], self.features)


class GNFilmSilu(nn.Module):
    """GroupNorm -> FiLM -> SiLU, fused into Pallas kernels on TPU
    (:mod:`wdno_tpu.ops.norm_pallas`; XLA's GroupNorm lowering reduces over a
    reshaped ``[..., G, C/G]`` minor-dim-8 layout at ~6% lane utilization).

    Parameter names/shapes match ``nn.GroupNorm`` ('scale', 'bias'), so a
    checkpoint trained either way loads in both and the torch converter is
    unaffected; instantiate with ``name="GroupNorm_0"`` for tree parity.
    """

    groups: int = 8
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, scale_shift: Optional[Tuple[Array, Array]] = None) -> Array:
        from ..ops.norm_pallas import gn_film_silu

        gamma = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        scale = shift = None
        if scale_shift is not None:
            scale, shift = (s.reshape(s.shape[0], s.shape[-1]) for s in scale_shift)
        return gn_film_silu(x, gamma, beta, scale, shift,
                            groups=self.groups, eps=self.eps)


class ConvBlock(nn.Module):
    """Conv(k3) -> GroupNorm -> FiLM -> SiLU over any spatial rank
    (reference ``unet.py:129-148`` / ``conv3d.py:189-204``)."""

    dim_out: int
    groups: int = 8
    spatial_rank: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, scale_shift: Optional[Tuple[Array, Array]] = None) -> Array:
        k = (3,) * self.spatial_rank
        if self.spatial_rank == 3:
            # batched-2D decomposition: ~4x faster than XLA's conv3d on TPU,
            # identical parameters (name pinned to keep the tree stable)
            x = TemporalDecompConv3d(self.dim_out, k, dtype=self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(self.dim_out, k, padding="SAME", dtype=self.dtype)(x)
        # epsilon matches torch GroupNorm (1e-5) for checkpoint-conversion
        # parity; fused GN+FiLM+SiLU with the GroupNorm param tree pinned
        return GNFilmSilu(
            groups=self.groups, dtype=self.dtype, name="GroupNorm_0"
        )(x, scale_shift)


class ResnetBlock(nn.Module):
    """Two ConvBlocks + residual 1x1; FiLM from the time embedding
    (reference ``unet.py:150-181`` / ``conv3d.py:206-230``)."""

    dim_out: int
    groups: int = 8
    spatial_rank: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, time_emb: Optional[Array] = None) -> Array:
        scale_shift = None
        if time_emb is not None:
            h_t = nn.Dense(self.dim_out * 2, dtype=self.dtype)(nn.silu(time_emb))
            scale_shift = jnp.split(h_t, 2, axis=-1)
        h = ConvBlock(self.dim_out, self.groups, self.spatial_rank, self.dtype)(x, scale_shift)
        h = ConvBlock(self.dim_out, self.groups, self.spatial_rank, self.dtype)(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1,) * self.spatial_rank, dtype=self.dtype)(x)
        return h + x


def _split_heads(x: Array, heads: int) -> Array:
    """[B, N, H*D] -> [B, heads, N, D]."""
    b, n, hd = x.shape
    return x.reshape(b, n, heads, hd // heads).transpose(0, 2, 1, 3)


def _merge_heads(x: Array) -> Array:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


class LinearAttention(nn.Module):
    """Efficient linear attention over flattened positions
    (reference ``unet.py:183-223`` / ``conv3d.py:232-258``).

    Input [B, N, C]; q softmaxed over feature dim, k over positions;
    context = k v^T is a [D, D] matrix per head -> O(N D^2).
    """

    heads: int = 4
    dim_head: int = 32
    out_norm: bool = True  # reference 2D variant appends LayerNorm; 3D doesn't
    # The Pallas kernel is measurably SLOWER here than XLA's lowering (the
    # O(N d^2) contractions vectorize fine; only softmax layouts pad), so the
    # fused path is opt-in, unlike full attention where it wins ~10x.
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        out = None
        if self.fused:
            from ..ops.attention_pallas import fused_linear_attention

            out = fused_linear_attention(
                q, k, v, heads=self.heads, scale=self.dim_head**-0.5
            )
        if out is None:  # XLA fallback (also when a site row exceeds VMEM)
            q, k, v = (_split_heads(y, self.heads) for y in (q, k, v))  # [B,h,N,D]
            q = jax.nn.softmax(q, axis=-1) * (self.dim_head**-0.5)
            k = jax.nn.softmax(k, axis=-2)
            # context[b,h,d,e] = sum_n k[b,h,n,d] v[b,h,n,e]
            context = jnp.einsum("bhnd,bhne->bhde", k, v)
            out = jnp.einsum("bhde,bhnd->bhne", context, q)
            out = _merge_heads(out)
        out = nn.Dense(c, dtype=self.dtype)(out)
        if self.out_norm:
            out = ChannelLayerNorm(dtype=self.dtype)(out)
        return out


class Attention(nn.Module):
    """Full softmax attention over positions, optional rotary embedding and
    additive position bias (reference ``unet.py:225-259``, ``conv3d.py:277-353``).

    Input [..., N, C]: arbitrary leading batch axes.  By default routes
    through the fused Pallas kernel (:mod:`wdno_tpu.ops.attention_pallas`),
    which keeps the padded [.., N, N] score tensors out of HBM; set
    ``fused=False`` for the plain einsum lowering.
    """

    heads: int = 4
    dim_head: int = 32
    use_rotary: bool = False
    fused: bool = True
    # the reference's 2D full attention projects out with bias
    # (unet.py to_out Conv2d), its 3D temporal attention without
    out_bias: bool = False
    # temporal attention over axis 1 of a native [B, F, H, W, C] input —
    # qkv/out projections and the fused kernel all run in the video layout,
    # so the 'b f h w c <-> b (h w) f c' transposes never hit HBM
    native_video: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, pos_bias: Optional[Array] = None) -> Array:
        c = x.shape[-1]
        n = x.shape[-2]
        lead = x.shape[:-2]
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype)(x)

        if self.native_video and x.ndim == 5:
            from ..ops.attention_pallas import temporal_attention_native

            b, f, hh, ww, _ = x.shape
            bias = pos_bias if pos_bias is not None else jnp.zeros(
                (self.heads, f, f), jnp.float32)
            assert self.use_rotary, "native video path assumes rotary"
            out = temporal_attention_native(
                qkv, bias, heads=self.heads, dim_head=self.dim_head,
                scale=self.dim_head**-0.5)
            if out is None:  # block too large for VMEM: transposed fallback
                from ..ops.attention_pallas import fused_attention

                qf = qkv.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, f,
                                                          3 * hidden)
                q, k, v = jnp.split(qf, 3, axis=-1)
                q = apply_rotary_packed(q * self.dim_head**-0.5, self.heads)
                k = apply_rotary_packed(k, self.heads)
                out = fused_attention(q, k, v, bias, heads=self.heads)
                assert out is not None, "frame count too large for VMEM kernels"
                out = out.reshape(b, hh, ww, f, hidden).transpose(0, 3, 1, 2, 4)
            return nn.Dense(c, use_bias=self.out_bias, dtype=self.dtype)(out)

        q, k, v = jnp.split(qkv, 3, axis=-1)

        if self.fused:
            from ..ops.attention_pallas import fused_attention

            qf = q.reshape((-1, n, hidden)) * (self.dim_head**-0.5)
            kf = k.reshape((-1, n, hidden))
            vf = v.reshape((-1, n, hidden))
            if self.use_rotary:
                qf = apply_rotary_packed(qf, self.heads)
                kf = apply_rotary_packed(kf, self.heads)
            out = fused_attention(qf, kf, vf, pos_bias, heads=self.heads)
            if out is not None:  # None: sequence too long for the VMEM kernel
                out = out.reshape(lead + (n, hidden))
                return nn.Dense(c, use_bias=self.out_bias, dtype=self.dtype)(out)

        def split(y):  # [..., N, H*D] -> [..., H, N, D]
            y = y.reshape(lead + (n, self.heads, self.dim_head))
            return jnp.moveaxis(y, -2, -3)

        q, k, v = split(q), split(k), split(v)
        q = q * (self.dim_head**-0.5)
        if self.use_rotary:
            q = apply_rotary(q)
            k = apply_rotary(k)
        sim = jnp.einsum("...hid,...hjd->...hij", q, k)
        if pos_bias is not None:
            sim = sim + pos_bias
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
        out = jnp.einsum("...hij,...hjd->...hid", attn, v)
        out = jnp.moveaxis(out, -3, -2).reshape(lead + (n, hidden))
        return nn.Dense(c, use_bias=self.out_bias, dtype=self.dtype)(out)


def apply_rotary(x: Array, theta: float = 10000.0) -> Array:
    """Interleaved rotary position embedding along axis -2 (positions).

    x: [..., N, D] with even D; lucidrains rotary-embedding-torch semantics
    (reference ``conv3d.py:381``).
    """
    n, d = x.shape[-2], x.shape[-1]
    half = d // 2
    freqs = 1.0 / (theta ** (np.arange(half) / half))
    pos = jnp.arange(n)[:, None] * freqs[None, :]  # [N, half]
    cos = jnp.repeat(jnp.cos(pos), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(pos), 2, axis=-1)
    x2 = x.reshape(x.shape[:-1] + (half, 2))
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)
    return x * cos.astype(x.dtype) + rot * sin.astype(x.dtype)


def apply_rotary_packed(x: Array, heads: int, theta: float = 10000.0) -> Array:
    """Rotary embedding on head-packed ``[N, S, heads*d]`` tensors.

    Same per-head semantics as :func:`apply_rotary` but the head axis stays
    merged into the 128-wide lane dimension (the cos/sin tables tile across
    heads), so no padded [N, S, h, d] intermediate is materialized.
    """
    s, hd = x.shape[-2], x.shape[-1]
    d = hd // heads
    half = d // 2
    freqs = 1.0 / (theta ** (np.arange(half) / half))
    pos = np.arange(s)[:, None] * freqs[None, :]  # [S, half]
    cos = np.tile(np.repeat(np.cos(pos), 2, axis=-1), (1, heads))  # [S, hd]
    sin = np.tile(np.repeat(np.sin(pos), 2, axis=-1), (1, heads))
    x2 = x.reshape(x.shape[:-1] + (hd // 2, 2))
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)
    return x * jnp.asarray(cos, x.dtype) + rot * jnp.asarray(sin, x.dtype)


def relative_position_buckets(n: int, num_buckets: int = 32, max_distance: int = 128) -> np.ndarray:
    """Static [n, n] T5-style bucket indices (reference ``conv3d.py:86-112``)."""
    q = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    rel = k - q
    neg = -rel
    nb = num_buckets // 2
    ret = (neg < 0).astype(np.int64) * nb
    neg = np.abs(neg)
    max_exact = nb // 2
    is_small = neg < max_exact
    with np.errstate(divide="ignore"):
        val_if_large = max_exact + (
            np.log(np.maximum(neg, 1) / max_exact) / math.log(max_distance / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, nb - 1)
    ret = ret + np.where(is_small, neg, val_if_large)
    return ret


class RelativePositionBias(nn.Module):
    """Learned bucketed relative position bias -> [heads, n, n]."""

    heads: int = 8
    num_buckets: int = 32
    max_distance: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, n: int) -> Array:
        table = self.param(
            "rel_pos_bias",
            nn.initializers.normal(0.02),
            (self.num_buckets, self.heads),
        )
        buckets = relative_position_buckets(n, self.num_buckets, self.max_distance)
        # jnp-index the (possibly numpy, e.g. orbax-restored) table with the
        # static numpy buckets: numpy_table[traced_index] raises under scan
        # tracing because jnp.asarray stages constants as tracers there
        values = jnp.asarray(table)[buckets]  # [n, n, heads]
        return jnp.transpose(values, (2, 0, 1)).astype(self.dtype)
