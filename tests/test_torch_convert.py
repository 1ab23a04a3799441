"""Checkpoint-conversion validation against the upstream torch models.

These tests need the reference repository (mounted read-only in the dev
image) and torch; they skip cleanly elsewhere.  They are the strongest
architecture-parity check we have: a randomly initialized upstream model and
the converted flax model must produce the same outputs.
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="upstream reference repo not available"
)


@pytest.fixture(autouse=True)
def _exact_f32():
    """JAX CPU convs default to reduced-precision paths on avx512bf16 hosts
    (measured 0.5% error vs an f64 oracle); parity checks need exact f32."""
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", None)


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_unet2d_conversion_forward_parity():
    import sys

    sys.path.insert(0, os.path.join(REF, "burgers"))
    from ddpm_burgers.unet import Unet2D as TorchUnet2D

    import jax
    import jax.numpy as jnp
    from wdno_tpu.models.unet2d import UNet2D
    from wdno_tpu.utils.torch_convert import convert_unet2d

    dim, mults, C = 8, (1, 2), 9
    tm = TorchUnet2D(dim=dim, out_dim=C, dim_mults=mults, channels=C, resnet_block_groups=1)
    tm.eval()

    params = convert_unet2d(_np_sd(tm), dim_mults=mults)

    fm = UNet2D(dim=dim, out_dim=C, dim_mults=mults, channels=C, resnet_block_groups=1)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, C)).astype(np.float32)
    t = np.array([3, 7], np.int64)

    # template init to check tree-structure equality
    tmpl = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t, jnp.int32))
    ts = jax.tree_util.tree_structure(tmpl)
    cs = jax.tree_util.tree_structure(jax.tree_util.tree_map(jnp.asarray, params))
    assert ts == cs, f"param tree mismatch:\n{ts}\nvs\n{cs}"
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(tmpl)[0],
        jax.tree_util.tree_flatten_with_path(params)[0],
    ):
        assert va.shape == np.asarray(vb).shape, (jax.tree_util.keystr(pa), va.shape, np.asarray(vb).shape)

    out_f = np.asarray(fm.apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x), jnp.asarray(t, jnp.int32)))

    with torch.no_grad():
        out_t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t)).numpy()
    out_t = out_t.transpose(0, 2, 3, 1)

    np.testing.assert_allclose(out_f, out_t, atol=2e-4, rtol=1e-3)


def _stub_upstream_deps():
    """Provide the upstream model's absent pip deps as faithful minimal
    stubs: torchvision (unused at model runtime), einops_exts helpers, and
    rotary-embedding-torch (interleaved-pair rotary, theta=10000 — the
    library semantics the reference trained with)."""
    import sys
    import types

    from einops import rearrange

    if "torchvision" not in sys.modules:
        class _Any:
            def __getattr__(self, name):
                return _Any()

            def __call__(self, *a, **k):
                return _Any()

        tv = types.ModuleType("torchvision")
        tv.transforms = _Any()
        tv.utils = _Any()
        sys.modules["torchvision"] = tv

    if "einops_exts" not in sys.modules:
        eex = types.ModuleType("einops_exts")
        eex.rearrange_many = lambda ts, pattern, **kw: [rearrange(t, pattern, **kw) for t in ts]
        eex.check_shape = lambda t, pattern, **kw: t
        sys.modules["einops_exts"] = eex

    if "rotary_embedding_torch" not in sys.modules:
        ret = types.ModuleType("rotary_embedding_torch")

        class RotaryEmbedding(torch.nn.Module):
            def __init__(self, dim, theta=10000):
                super().__init__()
                inv = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
                self.register_buffer("inv_freq", inv)

            def rotate_queries_or_keys(self, x, seq_dim=-2):
                n = x.shape[seq_dim]
                freqs = torch.einsum(
                    "i,j->ij", torch.arange(n, dtype=self.inv_freq.dtype), self.inv_freq
                )
                freqs = freqs.repeat_interleave(2, dim=-1)  # [n, rot_dim]
                rd = freqs.shape[-1]
                xr, xp = x[..., :rd], x[..., rd:]
                cos, sin = freqs.cos(), freqs.sin()
                x2 = xr.reshape(*xr.shape[:-1], -1, 2)
                rot = torch.stack([-x2[..., 1], x2[..., 0]], dim=-1).reshape(xr.shape)
                return torch.cat([xr * cos + rot * sin, xp], dim=-1)

        ret.RotaryEmbedding = RotaryEmbedding
        sys.modules["rotary_embedding_torch"] = ret


def test_unet3d_conversion_forward_parity():
    import sys

    sys.path.insert(0, os.path.join(REF, "smoke"))
    _stub_upstream_deps()
    try:
        from video_diffusion_pytorch.video_diffusion_pytorch_conv3d import (
            Unet3D_with_Conv3D as TorchUnet3D,
        )
    except Exception as e:  # missing optional deps beyond the stubs
        pytest.skip(f"cannot import upstream Unet3D: {e}")

    import jax
    import jax.numpy as jnp
    from wdno_tpu.models.unet3d import UNet3D
    from wdno_tpu.utils.torch_convert import convert_unet3d

    dim, mults, C = 16, (1, 2), 6
    tm = TorchUnet3D(dim=dim, out_dim=C, dim_mults=mults, channels=C)
    tm.eval()

    params = convert_unet3d(_np_sd(tm), dim_mults=mults)

    fm = UNet3D(dim=dim, out_dim=C, dim_mults=mults, channels=C)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 16, 16, C)).astype(np.float32)
    t = np.array([5], np.int64)

    tmpl = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t, jnp.int32))
    assert jax.tree_util.tree_structure(tmpl) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, params)
    )

    out_f = np.asarray(fm.apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x), jnp.asarray(t, jnp.int32)))

    with torch.no_grad():
        # reference forward takes [B, F, C, H, W] (permuted internally)
        out_t = tm(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)), torch.from_numpy(t)).numpy()
    out_t = out_t.transpose(0, 1, 3, 4, 2)

    np.testing.assert_allclose(out_f, out_t, atol=5e-4, rtol=1e-3)


def test_load_reference_checkpoint_prefixes(tmp_path):
    """Round-trip a reference-format pickle: GaussianDiffusion buffers are
    dropped, the 'model.' / 'ema_model.model.' prefixes stripped."""
    import sys

    sys.path.insert(0, os.path.join(REF, "burgers"))
    from ddpm_burgers.unet import Unet2D as TorchUnet2D

    from wdno_tpu.utils.torch_convert import load_reference_checkpoint

    tm = TorchUnet2D(dim=8, out_dim=9, dim_mults=(1, 2), channels=9, resnet_block_groups=1)
    sd = tm.state_dict()
    ckpt = {
        "step": 7,
        "model": {**{f"model.{k}": v for k, v in sd.items()},
                  "betas": torch.zeros(10)},
        "ema": {**{f"ema_model.model.{k}": v * 2 for k, v in sd.items()},
                "ema_model.betas": torch.zeros(10), "initted": torch.tensor(True)},
    }
    p = tmp_path / "model-7.pt"
    torch.save(ckpt, p)

    params = load_reference_checkpoint(str(p), model="unet2d", dim_mults=(1, 2), use_ema=False)
    params_ema = load_reference_checkpoint(str(p), model="unet2d", dim_mults=(1, 2), use_ema=True)
    a = params["params"]["Conv_0"]["kernel"]
    b = params_ema["params"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(b, 2 * a, rtol=1e-6)


def test_convert_torch_cli_to_eval(tmp_path):
    """Full interop path: reference-format pickle -> convert-torch CLI ->
    eval-burgers --checkpoint converted runs the converted weights."""
    import json
    import sys

    sys.path.insert(0, os.path.join(REF, "burgers"))
    from ddpm_burgers.unet import Unet2D as TorchUnet2D

    from wdno_tpu.cli import main

    data, results = str(tmp_path / "d"), str(tmp_path / "r")
    main(["datagen-burgers", "--n_train", "8", "--n_test", "8",
          "--super_factor", "2", "--batch", "8", "--out", data])
    main(["prep-burgers", "--data", data, "--n_downsample", "1"])

    tm = TorchUnet2D(dim=8, out_dim=9, dim_mults=(1, 2), channels=9,
                     resnet_block_groups=1)
    sd = tm.state_dict()
    ckpt = {
        "step": 7,
        "model": {f"model.{k}": v for k, v in sd.items()},
        "ema": {f"ema_model.model.{k}": v for k, v in sd.items()},
    }
    pt = str(tmp_path / "ref-model-7.pt")
    torch.save(ckpt, pt)

    main(["convert-torch", "--ckpt", pt, "--arch", "unet2d",
          "--exp", "ref", "--results", results, "--",
          "--dim", "8", "--dim_mults", "1", "2", "--bf16", "False"])
    assert os.path.exists(os.path.join(results, "ref", "model-converted"))

    main(["eval-burgers", "--data", data, "--results", results,
          "--exp", "ref", "--task", "sim", "--checkpoint", "converted",
          "--ntest", "4", "--batch_eval", "4", "--ddim_steps", "5"])
    res = json.load(open(os.path.join(results, "ref", "eval_results.json")))
    assert np.isfinite(res["sim"]["ddpm_mse"]["mean"])
