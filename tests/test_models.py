"""Denoiser model tests: shapes, dtype policy, gradient flow."""

import numpy as np
import pytest

# heavy integration surface: excluded from the fast gate
# (`pytest -m 'not slow'`, ~3 min); the campaign/nightly run covers it
pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from wdno_tpu.models.unet2d import UNet2D
from wdno_tpu.models.unet3d import UNet3D
from wdno_tpu.models.layers import apply_rotary, relative_position_buckets, sinusoidal_pos_emb


def test_sinusoidal_emb_shape_and_range():
    e = sinusoidal_pos_emb(jnp.array([0.0, 10.0, 999.0]), 128)
    assert e.shape == (3, 128)
    assert float(jnp.abs(e).max()) <= 1.0 + 1e-6


def test_rotary_preserves_norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 10, 32))
    y = apply_rotary(x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1),
        rtol=1e-5,
    )
    # position 0 is unrotated
    np.testing.assert_allclose(np.asarray(x[..., 0, :]), np.asarray(y[..., 0, :]), atol=1e-6)


def test_relative_position_buckets():
    b = relative_position_buckets(8)
    assert b.shape == (8, 8)
    assert (np.diag(b) == b[0, 0]).all()  # zero distance same bucket
    assert b.max() < 32 and b.min() >= 0
    # asymmetric: past vs future use different halves
    assert b[0, 5] != b[5, 0]


def test_unet2d_forward_shapes():
    model = UNet2D(dim=16, dim_mults=(1, 2), channels=9, resnet_block_groups=1)
    x = jnp.ones((2, 16, 16, 9))
    t = jnp.array([3, 7])
    params = model.init(jax.random.PRNGKey(0), x, t)
    y = model.apply(params, x, t)
    assert y.shape == x.shape
    assert y.dtype == jnp.float32
    assert np.isfinite(np.asarray(y)).all()


def test_unet2d_burgers_shape_64():
    model = UNet2D(dim=8, dim_mults=(1, 2, 4, 8), channels=9, resnet_block_groups=1)
    x = jnp.ones((1, 64, 64, 9))
    t = jnp.array([0])
    params = model.init(jax.random.PRNGKey(0), x, t)
    y = model.apply(params, x, t)
    assert y.shape == (1, 64, 64, 9)


def test_unet3d_forward_shapes():
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=42, resnet_groups=2, init_kernel_size=3)
    x = jnp.ones((1, 8, 16, 16, 42))
    t = jnp.array([5])
    params = model.init(jax.random.PRNGKey(0), x, t)
    y = model.apply(params, x, t)
    assert y.shape == x.shape
    assert y.dtype == jnp.float32


def test_unet2d_bf16_compute():
    model = UNet2D(dim=16, dim_mults=(1, 2), channels=4, resnet_block_groups=1, dtype=jnp.bfloat16)
    x = jnp.ones((2, 16, 16, 4))
    t = jnp.array([1, 2])
    params = model.init(jax.random.PRNGKey(0), x, t)
    # params stay f32
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32
    y = model.apply(params, x, t)
    assert y.dtype == jnp.float32  # output cast back
    assert np.isfinite(np.asarray(y)).all()


def test_unet2d_grad_flows():
    model = UNet2D(dim=8, dim_mults=(1, 2), channels=4, resnet_block_groups=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.array([1, 2])
    params = model.init(jax.random.PRNGKey(0), x, t)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x, t) ** 2))(params)
    norms = [float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms))
    assert sum(n > 0 for n in norms) > len(norms) * 0.9  # nearly all params receive grad


def test_temporal_decomp_conv3d_matches_conv3d(monkeypatch):
    """Both lowerings (native default + WDNO_DECOMP_CONV3D batched-2D
    decomposition) are numerically a (kd,kh,kw) conv3d."""
    import flax.linen as nn
    from wdno_tpu.models.layers import TemporalDecompConv3d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 8, 5)), jnp.float32)
    for ks, strides, pad in [
        ((3, 3, 3), (1, 1, 1), "SAME"),
        ((7, 7, 7), (1, 1, 1), "SAME"),
        ((1, 4, 4), (1, 2, 2), ((0, 0), (1, 1), (1, 1))),
    ]:
        ref = nn.Conv(7, ks, strides=strides, padding=pad,
                      precision=jax.lax.Precision.HIGHEST)
        fast = TemporalDecompConv3d(7, ks, strides=strides, padding=pad)
        p = ref.init(jax.random.PRNGKey(1), x)
        o_ref = ref.apply(p, x)
        for env in ("", "1"):
            monkeypatch.setenv("WDNO_DECOMP_CONV3D", env)
            o_fast = fast.apply(p, x)
            assert o_ref.shape == o_fast.shape, (ks, o_ref.shape, o_fast.shape)
            np.testing.assert_allclose(
                np.asarray(o_fast), np.asarray(o_ref), atol=2e-4,
                err_msg=f"{ks} env={env!r}",
            )


def test_unet3d_samples_with_numpy_restored_params():
    """Checkpoint-restored (numpy) params must work inside the sampling scan
    (regression: numpy rel-pos table indexed by a scan-staged constant)."""
    from wdno_tpu.core.diffusion import GaussianDiffusion
    from wdno_tpu.core.schedules import make_schedule
    from wdno_tpu.models.unet3d import UNet3D

    model = UNet3D(dim=8, dim_mults=(1, 2), channels=4, resnet_groups=2,
                   init_kernel_size=3)
    x = jnp.zeros((2, 4, 8, 8, 4))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32))
    params_np = jax.device_get(params)  # numpy pytree, like an orbax restore
    gd = GaussianDiffusion(model.apply, make_schedule("sigmoid", 8),
                           state_shape=(4, 8, 8, 4), sampling_timesteps=3)
    out = gd.sample(params_np, jax.random.PRNGKey(1), 2)
    assert np.isfinite(np.asarray(out)).all()
