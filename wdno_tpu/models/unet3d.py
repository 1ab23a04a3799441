"""3D video U-Net denoiser for the smoke workload (channels-last, NDHWC).

Re-designed from the reference's vendored lucidrains variant
``smoke/video_diffusion_pytorch/video_diffusion_pytorch_conv3d.py:357-574``
(``Unet3D_with_Conv3D``): full 3D convs (7^3 init), temporal attention with
rotary embeddings + bucketed relative-position bias, per-scale
[ResnetBlock x2, spatial linear attention, temporal attention, spatial-only
(1,4,4)/(1,2,2) down/upsampling], spatial+temporal full attention at the
bottleneck.

State layout here is [B, F, H, W, C]; the reference permutes [B,F,C,H,W] ->
[B,C,F,H,W] internally (``conv3d.py:505``) — channels-last needs no permute.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import (
    Attention,
    ChannelLayerNorm,
    LinearAttention,
    RelativePositionBias,
    ResnetBlock,
    SpatialConvTranspose3d,
    TemporalDecompConv3d,
    TimeMLP,
)

Array = jnp.ndarray


class _SpatialLinearAttention(nn.Module):
    """Linear attention over H*W per (batch, frame) (reference ``conv3d.py:232-258``)."""

    heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, f, h, w, c = x.shape
        y = ChannelLayerNorm(dtype=self.dtype)(x)
        y = y.reshape(b * f, h * w, c)
        y = LinearAttention(heads=self.heads, out_norm=False, dtype=self.dtype)(y)
        return x + y.reshape(b, f, h, w, c)


class _TemporalAttention(nn.Module):
    """Full attention over frames per spatial site, with rotary + rel-pos
    bias (reference ``conv3d.py:383,443``)."""

    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, pos_bias: Array) -> Array:
        y = ChannelLayerNorm(dtype=self.dtype)(x)
        # frame attention in the native [B, F, H, W, C] layout: the fused
        # kernel reads strided, so the 'b c f h w -> b (h w) f c' transpose
        # of the reference never materializes (conv3d.py:383,443)
        y = Attention(
            heads=self.heads, dim_head=self.dim_head, use_rotary=True,
            native_video=True, dtype=self.dtype
        )(y, pos_bias=pos_bias)
        return x + y


class _SpatialFullAttention(nn.Module):
    """Full attention over H*W per (batch, frame) at the bottleneck
    (reference ``conv3d.py:450-452``)."""

    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, f, h, w, c = x.shape
        y = ChannelLayerNorm(dtype=self.dtype)(x)
        y = y.reshape(b * f, h * w, c)
        y = Attention(heads=self.heads, dim_head=self.dim_head, dtype=self.dtype)(y)
        return x + y.reshape(b, f, h, w, c)


class UNet3D(nn.Module):
    """Noise-prediction U-Net over [B, F, H, W, C] wavelet-video states."""

    dim: int = 64
    out_dim: int | None = None
    dim_mults: Sequence[int] = (1, 2, 4)
    channels: int = 42
    attn_heads: int = 4
    attn_dim_head: int = 32
    resnet_groups: int = 8
    init_kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, time: Array) -> Array:
        out_dim = self.out_dim or self.channels
        time_dim = self.dim * 4
        b, f, hh, ww, c = x.shape

        pos_bias = RelativePositionBias(
            heads=self.attn_heads, max_distance=32, dtype=self.dtype
        )(f)

        t = TimeMLP(self.dim, time_dim, dtype=self.dtype)(time)

        x = x.astype(self.dtype)
        ks = self.init_kernel_size
        x = TemporalDecompConv3d(
            self.dim, (ks, ks, ks), dtype=self.dtype, name="Conv_0"
        )(x)
        conv_i = 1
        x = _TemporalAttention(self.attn_heads, self.attn_dim_head, self.dtype)(x, pos_bias)
        r = x

        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        def block(dim_out):
            return ResnetBlock(
                dim_out, groups=self.resnet_groups, spatial_rank=3, dtype=self.dtype
            )

        h = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i == num_res - 1
            x = block(dim_out)(x, t)
            x = block(dim_out)(x, t)
            x = _SpatialLinearAttention(self.attn_heads, self.dtype)(x)
            x = _TemporalAttention(self.attn_heads, self.attn_dim_head, self.dtype)(x, pos_bias)
            h.append(x)
            if not is_last:
                # spatial-only strided conv (1,4,4)/(1,2,2), reference conv3d.py:162-163
                x = TemporalDecompConv3d(
                    dim_out,
                    (1, 4, 4),
                    strides=(1, 2, 2),
                    padding=((0, 0), (1, 1), (1, 1)),
                    dtype=self.dtype,
                    name=f"Conv_{conv_i}",
                )(x)
                conv_i += 1

        mid_dim = dims[-1]
        x = block(mid_dim)(x, t)
        x = _SpatialFullAttention(self.attn_heads, self.attn_dim_head, self.dtype)(x)
        x = _TemporalAttention(self.attn_heads, self.attn_dim_head, self.dtype)(x, pos_bias)
        x = block(mid_dim)(x, t)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i == num_res - 1
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = block(dim_in)(x, t)
            x = block(dim_in)(x, t)
            x = _SpatialLinearAttention(self.attn_heads, self.dtype)(x)
            x = _TemporalAttention(self.attn_heads, self.attn_dim_head, self.dtype)(x, pos_bias)
            if not is_last:
                # spatial-only transposed conv 2x (reference conv3d.py:159-160)
                x = SpatialConvTranspose3d(
                    dim_in, (1, 4, 4), strides=(1, 2, 2), dtype=self.dtype,
                    name=f"ConvTranspose_{i}",
                )(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(self.dim, groups=self.resnet_groups, spatial_rank=3, dtype=self.dtype)(x)
        x = nn.Conv(out_dim, (1, 1, 1), dtype=jnp.float32, name=f"Conv_{conv_i}")(x)
        return x.astype(jnp.float32)
