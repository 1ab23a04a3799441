"""Convert reference torch checkpoints to wdno_tpu flax parameter trees.

The reference ships torch pickles ``{step, model, opt, ema, scaler}``
(``burgers/ddpm_burgers/train_diffusion.py:148-162``, ``smoke/ddpm/
diffusion_2d.py:1187-1199``).  This module maps the denoiser ``state_dict``s
onto our flax modules so released WDNO checkpoints evaluate directly on TPU
(SURVEY §7 "hard parts" #6):

* ``convert_unet2d``  — Burgers ``Unet2D`` (``unet.py:263-411``)
* ``convert_unet3d``  — smoke ``Unet3D_with_Conv3D`` (``video_diffusion_
  pytorch_conv3d.py:357-574``)

Layout transforms: torch Conv (O, I, *k) -> flax (*k, I, O); Linear (O, I)
-> (I, O); 1x1-conv attention projections -> Dense kernels; the
space-to-depth downsample's 4x-channel ORDER differs (reference rearranges
``c p1 p2``-major, ours ``p1 p2 c``-major), permuted here.

Inputs are plain numpy arrays (call ``{k: v.numpy() for k, v in sd.items()}``
on a torch state_dict); no torch dependency in this module.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

__all__ = ["convert_unet2d", "convert_unet3d", "load_reference_checkpoint"]

Arrays = Dict[str, np.ndarray]


def load_reference_checkpoint(path: str, *, model: str = "unet3d", dim_mults=None, use_ema: bool = True) -> dict:
    """Load a reference torch checkpoint pickle and convert the denoiser.

    The pickles hold ``{step, model, ema, opt, scaler}`` where ``model`` is
    the GaussianDiffusion state_dict — denoiser weights under the ``model.``
    prefix plus schedule buffers (betas, alphas_cumprod, ...; recomputed on
    our side), and ``ema`` is an ema_pytorch state_dict with the averaged
    copy under ``ema_model.model.`` (``train_diffusion.py:148-162``).
    Requires torch (CPU) to unpickle.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    src = ckpt["ema"] if (use_ema and "ema" in ckpt) else ckpt["model"]
    prefix = "ema_model.model." if (use_ema and "ema" in ckpt) else "model."
    sd = {
        k[len(prefix):]: v.numpy()
        for k, v in src.items()
        if k.startswith(prefix)
    }
    if model == "unet2d":
        return convert_unet2d(sd, dim_mults=dim_mults or (1, 2, 4, 8))
    return convert_unet3d(sd, dim_mults=dim_mults or (1, 2, 4))


def _conv(sd: Arrays, key: str, out: dict, name: str) -> None:
    w = sd.pop(key + ".weight")
    # (O, I, *k) -> (*k, I, O)
    perm = tuple(range(2, w.ndim)) + (1, 0)
    entry = {"kernel": np.ascontiguousarray(w.transpose(perm))}
    if key + ".bias" in sd:
        entry["bias"] = sd.pop(key + ".bias")
    out[name] = entry


def _dense(sd: Arrays, key: str, out: dict, name: str) -> None:
    w = sd.pop(key + ".weight")
    entry = {"kernel": np.ascontiguousarray(w.T)}
    if key + ".bias" in sd:
        entry["bias"] = sd.pop(key + ".bias")
    out[name] = entry


def _dense_from_conv1x1(sd: Arrays, key: str, out: dict, name: str) -> None:
    """1x1 (or 1x1x1) conv used as a per-position projection -> Dense."""
    w = sd.pop(key + ".weight")
    w = w.reshape(w.shape[0], w.shape[1])  # (O, I)
    entry = {"kernel": np.ascontiguousarray(w.T)}
    if key + ".bias" in sd:
        entry["bias"] = sd.pop(key + ".bias")
    out[name] = entry


def _norm_g(sd: Arrays, key: str, out: dict, name: str) -> None:
    out[name] = {"g": sd.pop(key).reshape(-1)}


def _group_norm(sd: Arrays, prefix: str, out: dict, name: str) -> None:
    out[name] = {"scale": sd.pop(prefix + ".weight"), "bias": sd.pop(prefix + ".bias")}


def _resnet_block(sd: Arrays, prefix: str) -> dict:
    """Reference ResnetBlock (``unet.py:150-181`` / ``conv3d.py:206-230``)
    -> our :class:`~wdno_tpu.models.layers.ResnetBlock` subtree."""
    out: dict = {}
    if prefix + ".mlp.1.weight" in sd:
        _dense(sd, prefix + ".mlp.1", out, "Dense_0")
    for j, blk in enumerate(("block1", "block2")):
        sub: dict = {}
        _conv(sd, f"{prefix}.{blk}.proj", sub, "Conv_0")
        _group_norm(sd, f"{prefix}.{blk}.norm", sub, "GroupNorm_0")
        out[f"ConvBlock_{j}"] = sub
    if prefix + ".res_conv.weight" in sd:
        _conv(sd, prefix + ".res_conv", out, "Conv_0")
    return out


def _linear_attention_2d(sd: Arrays, prefix: str) -> dict:
    """Residual(PreNorm(LinearAttention)) (``unet.py:183-223``)
    -> our ``_PreNormLinearAttn2D`` subtree."""
    out: dict = {}
    _norm_g(sd, prefix + ".fn.norm.g", out, "ChannelLayerNorm_0")
    la: dict = {}
    _dense_from_conv1x1(sd, prefix + ".fn.fn.to_qkv", la, "Dense_0")
    _dense_from_conv1x1(sd, prefix + ".fn.fn.to_out.0", la, "Dense_1")
    _norm_g(sd, prefix + ".fn.fn.to_out.1.g", la, "ChannelLayerNorm_0")
    out["LinearAttention_0"] = la
    return out


def _full_attention_2d(sd: Arrays, prefix: str) -> dict:
    """Residual(PreNorm(Attention)) at the bottleneck (``unet.py:225-259``)."""
    out: dict = {}
    _norm_g(sd, prefix + ".fn.norm.g", out, "ChannelLayerNorm_0")
    at: dict = {}
    _dense_from_conv1x1(sd, prefix + ".fn.fn.to_qkv", at, "Dense_0")
    _dense_from_conv1x1(sd, prefix + ".fn.fn.to_out", at, "Dense_1")
    out["Attention_0"] = at
    return out


def _space_to_depth_conv(sd: Arrays, key: str, out: dict, name: str) -> None:
    """Downsample 1x1 conv over space-to-depth channels.

    The reference rearranges ``b c (h p1) (w p2) -> b (c p1 p2) h w``
    (c-major); our ``_downsample`` produces (p1 p2 c)-major — permute the
    input axis of the kernel accordingly.
    """
    w = sd.pop(key + ".weight")  # (O, 4C, 1, 1)
    o, ic = w.shape[0], w.shape[1]
    c = ic // 4
    w = w.reshape(o, c, 2, 2)  # torch input index = c*4 + p1*2 + p2
    w = w.transpose(0, 2, 3, 1).reshape(o, ic)  # -> (p1, p2, c)-major
    entry = {"kernel": w.T[None, None]}  # (1, 1, 4C, O)
    if key + ".bias" in sd:
        entry["bias"] = sd.pop(key + ".bias")
    out[name] = entry


def convert_unet2d(
    state_dict: Arrays, *, dim_mults: Sequence[int] = (1, 2, 4, 8)
) -> dict:
    """Reference ``Unet2D`` state_dict (numpy values) -> flax ``{"params": …}``.

    The flax names are our UNet2D's deterministic call-order numbering
    (``models/unet2d.py``); torch key layout from ``unet.py:263-411``.
    """
    sd = dict(state_dict)
    n = len(dim_mults)
    p: dict = {}

    p["TimeMLP_0"] = {}
    _dense(sd, "time_mlp.1", p["TimeMLP_0"], "Dense_0")
    _dense(sd, "time_mlp.3", p["TimeMLP_0"], "Dense_1")
    _conv(sd, "init_conv", p, "Conv_0")

    for i in range(n):
        p[f"ResnetBlock_{2 * i}"] = _resnet_block(sd, f"downs.{i}.0")
        p[f"ResnetBlock_{2 * i + 1}"] = _resnet_block(sd, f"downs.{i}.1")
        p[f"_PreNormLinearAttn2D_{i}"] = _linear_attention_2d(sd, f"downs.{i}.2")
        if f"downs.{i}.3.1.weight" in sd:  # space-to-depth downsample
            _space_to_depth_conv(sd, f"downs.{i}.3.1", p, f"Conv_{1 + i}")
        else:  # last scale: plain 3x3
            _conv(sd, f"downs.{i}.3", p, f"Conv_{1 + i}")

    p[f"ResnetBlock_{2 * n}"] = _resnet_block(sd, "mid_block1")
    p["_PreNormAttn2D_0"] = _full_attention_2d(sd, "mid_attn")
    p[f"ResnetBlock_{2 * n + 1}"] = _resnet_block(sd, "mid_block2")

    for i in range(n):
        p[f"ResnetBlock_{2 * n + 2 + 2 * i}"] = _resnet_block(sd, f"ups.{i}.0")
        p[f"ResnetBlock_{2 * n + 3 + 2 * i}"] = _resnet_block(sd, f"ups.{i}.1")
        p[f"_PreNormLinearAttn2D_{n + i}"] = _linear_attention_2d(sd, f"ups.{i}.2")
        if f"ups.{i}.3.1.weight" in sd:  # nearest-upsample + 3x3
            _conv(sd, f"ups.{i}.3.1", p, f"Conv_{n + 1 + i}")
        else:
            _conv(sd, f"ups.{i}.3", p, f"Conv_{n + 1 + i}")

    p[f"ResnetBlock_{4 * n + 2}"] = _resnet_block(sd, "final_res_block")
    _conv(sd, "final_conv", p, f"Conv_{2 * n + 1}")

    if sd:
        raise ValueError(f"unconsumed torch keys: {sorted(sd)[:8]} (+{len(sd)})")
    return {"params": p}


# --------------------------------------------------------------------- 3D


def _norm_gamma(sd: Arrays, key: str, out: dict, name: str) -> None:
    out[name] = {"g": sd.pop(key).reshape(-1)}


def _attention_3d(sd: Arrays, prefix: str, *, rotary: bool) -> dict:
    """Residual(PreNorm(EinopsToAndFrom(Attention))) with Linear qkv/out
    (``conv3d.py:277-353``); the rotary inv_freq buffer is deterministic
    (theta=10000) and dropped."""
    out: dict = {}
    _norm_gamma(sd, prefix + ".fn.norm.gamma", out, "ChannelLayerNorm_0")
    at: dict = {}
    _dense(sd, prefix + ".fn.fn.fn.to_qkv", at, "Dense_0")
    _dense(sd, prefix + ".fn.fn.fn.to_out", at, "Dense_1")
    out["Attention_0"] = at
    if rotary:
        sd.pop(prefix + ".fn.fn.fn.rotary_emb.inv_freq", None)
    return out


def _spatial_linear_attention_3d(sd: Arrays, prefix: str) -> dict:
    """Residual(PreNorm(SpatialLinearAttention)) (``conv3d.py:232-258``):
    conv-1x1 qkv (no bias) + conv-1x1 out (bias), no out-norm."""
    out: dict = {}
    _norm_gamma(sd, prefix + ".fn.norm.gamma", out, "ChannelLayerNorm_0")
    la: dict = {}
    _dense_from_conv1x1(sd, prefix + ".fn.fn.to_qkv", la, "Dense_0")
    _dense_from_conv1x1(sd, prefix + ".fn.fn.to_out", la, "Dense_1")
    out["LinearAttention_0"] = la
    return out


def convert_unet3d(
    state_dict: Arrays, *, dim_mults: Sequence[int] = (1, 2, 4),
) -> dict:
    """Reference ``Unet3D_with_Conv3D`` state_dict -> flax ``{"params": …}``
    for our :class:`~wdno_tpu.models.unet3d.UNet3D`.

    Torch key layout from ``video_diffusion_pytorch_conv3d.py:357-574``.
    """
    sd = dict(state_dict)
    n = len(dim_mults)
    p: dict = {}

    p["RelativePositionBias_0"] = {
        "rel_pos_bias": sd.pop("time_rel_pos_bias.relative_attention_bias.weight")
    }
    p["TimeMLP_0"] = {}
    _dense(sd, "time_mlp.1", p["TimeMLP_0"], "Dense_0")
    _dense(sd, "time_mlp.3", p["TimeMLP_0"], "Dense_1")
    _conv(sd, "init_conv", p, "Conv_0")
    p["_TemporalAttention_0"] = _attention_3d(sd, "init_temporal_attn", rotary=True)

    conv_i = 1
    rb = 0
    sla = 0
    ta = 1
    for i in range(n):
        p[f"ResnetBlock_{rb}"] = _resnet_block(sd, f"downs.{i}.0"); rb += 1
        p[f"ResnetBlock_{rb}"] = _resnet_block(sd, f"downs.{i}.1"); rb += 1
        p[f"_SpatialLinearAttention_{sla}"] = _spatial_linear_attention_3d(sd, f"downs.{i}.2"); sla += 1
        p[f"_TemporalAttention_{ta}"] = _attention_3d(sd, f"downs.{i}.3", rotary=True); ta += 1
        if f"downs.{i}.4.weight" in sd:  # spatial (1,4,4)/(1,2,2) strided conv
            _conv(sd, f"downs.{i}.4", p, f"Conv_{conv_i}"); conv_i += 1

    p[f"ResnetBlock_{rb}"] = _resnet_block(sd, "mid_block1"); rb += 1
    p["_SpatialFullAttention_0"] = _attention_3d(sd, "mid_spatial_attn", rotary=False)
    p[f"_TemporalAttention_{ta}"] = _attention_3d(sd, "mid_temporal_attn", rotary=True); ta += 1
    p[f"ResnetBlock_{rb}"] = _resnet_block(sd, "mid_block2"); rb += 1

    up_conv = 0
    for i in range(n):
        p[f"ResnetBlock_{rb}"] = _resnet_block(sd, f"ups.{i}.0"); rb += 1
        p[f"ResnetBlock_{rb}"] = _resnet_block(sd, f"ups.{i}.1"); rb += 1
        p[f"_SpatialLinearAttention_{sla}"] = _spatial_linear_attention_3d(sd, f"ups.{i}.2"); sla += 1
        p[f"_TemporalAttention_{ta}"] = _attention_3d(sd, f"ups.{i}.3", rotary=True); ta += 1
        if f"ups.{i}.4.weight" in sd:  # spatial transposed conv
            _conv_transpose(sd, f"ups.{i}.4", p, f"ConvTranspose_{up_conv}"); up_conv += 1

    p[f"ResnetBlock_{rb}"] = _resnet_block(sd, "final_conv.0")
    _conv(sd, "final_conv.1", p, f"Conv_{conv_i}")

    if sd:
        raise ValueError(f"unconsumed torch keys: {sorted(sd)[:8]} (+{len(sd)})")
    return {"params": p}


def _conv_transpose(sd: Arrays, key: str, out: dict, name: str) -> None:
    """torch ConvTranspose (I, O, *k) -> flax ConvTranspose (*k, I, O).

    flax's default (``transpose_kernel=False``) computes a fractionally
    strided *correlation*; torch's ConvTranspose is the conv gradient, i.e.
    the spatially flipped kernel — flip every kernel axis (verified exact
    against torch for the (1,4,4)/(1,2,2)/(0,1,1) upsample with SAME pad).
    """
    w = sd.pop(key + ".weight")
    perm = tuple(range(2, w.ndim)) + (0, 1)
    w = w.transpose(perm)
    w = w[tuple(slice(None, None, -1) for _ in range(w.ndim - 2))]
    entry = {"kernel": np.ascontiguousarray(w)}
    if key + ".bias" in sd:
        entry["bias"] = sd.pop(key + ".bias")
    out[name] = entry
