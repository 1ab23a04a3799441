"""Packed custom-VJP conv3d decomposition vs XLA's native conv3d."""

import numpy as np
import jax
import jax.numpy as jnp

from wdno_tpu.ops.conv3d_packed import packed_conv3d


def _native(x, k):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(x, k, (1, 1, 1), "SAME", dimension_numbers=dn)


def test_packed_conv3d_forward_matches_native():
    rng = np.random.default_rng(0)
    for kd, kh, kw in [(3, 3, 3), (7, 7, 7), (5, 3, 3)]:
        x = jnp.asarray(rng.standard_normal((2, 6, 5, 8, 4)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((kd, kh, kw, 4, 3)), jnp.float32)
        got = packed_conv3d(x, k)
        ref = _native(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, err_msg=str((kd, kh, kw)))


def test_packed_conv3d_grads_match_native():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 5, 4, 6, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 2)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((1, 5, 4, 6, 2)), jnp.float32)

    gx_p, gk_p = jax.grad(lambda x, k: (packed_conv3d(x, k) * cot).sum(),
                          argnums=(0, 1))(x, k)
    gx_n, gk_n = jax.grad(lambda x, k: (_native(x, k) * cot).sum(),
                          argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_n), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_n), atol=1e-4)


def test_decomp_conv3d_module_vjp_mode_matches_native(monkeypatch):
    from wdno_tpu.models.layers import TemporalDecompConv3d

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 6, 5, 8, 4)), jnp.float32)
    mod = TemporalDecompConv3d(features=3, kernel_size=(3, 3, 3))
    params = mod.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("WDNO_DECOMP_CONV3D", "vjp")
    got = mod.apply(params, x)
    monkeypatch.setenv("WDNO_DECOMP_CONV3D", "0")
    ref = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
