"""2D U-Net denoiser for the Burgers workload (channels-last, NHWC).

Re-designed from the reference ``burgers/ddpm_burgers/unet.py:263-411``
(``Unet2D``): init 7x7 conv; per scale [ResnetBlock x2 with linear attention
after the second, pixel-shuffle downsample]; full attention at the
bottleneck; nearest-upsample + conv on the way up with U-Net skip concats
(two per scale); final residual block over the concat with the init features.

Differences from the torch original are layout only (NHWC, space-to-depth
channel order); module topology, normalization and attention math match.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn
import jax

from .layers import (
    Attention,
    ChannelLayerNorm,
    LinearAttention,
    ResnetBlock,
    TimeMLP,
)

Array = jnp.ndarray


class _PreNormLinearAttn2D(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        y = ChannelLayerNorm(dtype=self.dtype)(x)
        y = y.reshape(b, h * w, c)
        y = LinearAttention(dtype=self.dtype)(y)
        return x + y.reshape(b, h, w, c)


class _PreNormAttn2D(nn.Module):
    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        y = ChannelLayerNorm(dtype=self.dtype)(x)
        y = y.reshape(b, h * w, c)
        y = Attention(
            heads=self.heads, dim_head=self.dim_head, out_bias=True, dtype=self.dtype
        )(y)
        return x + y.reshape(b, h, w, c)


def _downsample(x: Array, dim_out: int, dtype) -> Array:
    """Space-to-depth + 1x1 conv (reference ``unet.py:41-45``)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    return nn.Conv(dim_out, (1, 1), dtype=dtype)(x)


def _upsample(x: Array, dim_out: int, dtype) -> Array:
    """Nearest 2x + 3x3 conv (reference ``unet.py:35-39``)."""
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
    return nn.Conv(dim_out, (3, 3), padding="SAME", dtype=dtype)(x)


class UNet2D(nn.Module):
    """Noise-prediction U-Net over [B, T', X', C] states."""

    dim: int = 128
    out_dim: int | None = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 8
    resnet_block_groups: int = 1
    attn_heads: int = 4
    attn_dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, time: Array) -> Array:
        groups = self.resnet_block_groups
        out_dim = self.out_dim or self.channels
        time_dim = self.dim * 4

        t = TimeMLP(self.dim, time_dim, dtype=self.dtype)(time)

        x = x.astype(self.dtype)
        x = nn.Conv(self.dim, (7, 7), padding="SAME", dtype=self.dtype)(x)
        r = x

        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        def block(dim_out):
            return ResnetBlock(dim_out, groups=groups, spatial_rank=2, dtype=self.dtype)

        h = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i == num_res - 1
            x = block(dim_in)(x, t)
            h.append(x)
            x = block(dim_in)(x, t)
            x = _PreNormLinearAttn2D(dtype=self.dtype)(x)
            h.append(x)
            if not is_last:
                x = _downsample(x, dim_out, self.dtype)
            else:
                x = nn.Conv(dim_out, (3, 3), padding="SAME", dtype=self.dtype)(x)

        mid_dim = dims[-1]
        x = block(mid_dim)(x, t)
        x = _PreNormAttn2D(self.attn_heads, self.attn_dim_head, dtype=self.dtype)(x)
        x = block(mid_dim)(x, t)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i == num_res - 1
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = block(dim_out)(x, t)
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = block(dim_out)(x, t)
            x = _PreNormLinearAttn2D(dtype=self.dtype)(x)
            if not is_last:
                x = _upsample(x, dim_in, self.dtype)
            else:
                x = nn.Conv(dim_in, (3, 3), padding="SAME", dtype=self.dtype)(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = block(self.dim)(x, t)
        x = nn.Conv(out_dim, (1, 1), dtype=jnp.float32)(x)
        return x.astype(jnp.float32)
