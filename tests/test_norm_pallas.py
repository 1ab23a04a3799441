"""Fused GroupNorm+FiLM+SiLU (ops/norm_pallas.py) vs the flax composite.

The oracle is exactly what ConvBlock previously computed:
``nn.silu(nn.GroupNorm(groups)(x) * (scale+1) + shift)``
(reference ``unet.py:129-148`` / ``conv3d.py:189-204``).  Checked:
forward + all five gradients, on both the pure-jnp path and the Pallas
kernels (interpret mode on CPU), including a non-block-aligned N and the
Burgers groups=1 configuration; plus ConvBlock's parameter-tree stability.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from wdno_tpu.ops.norm_pallas import gn_film_silu


def _oracle(x, gamma, beta, scale, shift, groups):
    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    y = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    if scale is not None:
        bshape = (scale.shape[0],) + (1,) * (x.ndim - 2) + (scale.shape[-1],)
        y = y * (scale.reshape(bshape) + 1) + shift.reshape(bshape)
    return nn.silu(y)


def _setup(groups, c, film, spatial=(5, 7, 9), b=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, *spatial, c)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(c) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    scale = shift = None
    if film:
        scale = jnp.asarray(rng.standard_normal((b, c)) * 0.3, jnp.float32)
        shift = jnp.asarray(rng.standard_normal((b, c)) * 0.3, jnp.float32)
    return x, gamma, beta, scale, shift


@pytest.mark.parametrize("groups,c,film", [(8, 64, True), (8, 64, False),
                                           (1, 48, True), (4, 32, True)])
def test_forward_matches_flax(groups, c, film):
    x, gamma, beta, scale, shift = _setup(groups, c, film)
    want = _oracle(x, gamma, beta, scale, shift, groups)
    got = gn_film_silu(x, gamma, beta, scale, shift, groups=groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-5)


@pytest.mark.parametrize("film", [True, False])
def test_grads_match_flax(film):
    groups, c = 8, 64
    x, gamma, beta, scale, shift = _setup(groups, c, film)

    def loss_fused(x, gamma, beta, scale, shift):
        o = gn_film_silu(x, gamma, beta, scale, shift, groups=groups)
        return jnp.sum(jnp.sin(o) * o)

    def loss_oracle(x, gamma, beta, scale, shift):
        o = _oracle(x, gamma, beta, scale, shift, groups)
        return jnp.sum(jnp.sin(o) * o)

    args = (x, gamma, beta, scale, shift)
    nd = 5 if film else 3
    g_f = jax.grad(loss_fused, argnums=tuple(range(nd)))(*args)
    g_o = jax.grad(loss_oracle, argnums=tuple(range(nd)))(*args)
    for gf, go, name in zip(g_f, g_o, ["dx", "dgamma", "dbeta", "dscale", "dshift"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(go), atol=3e-5, rtol=3e-4,
            err_msg=name,
        )


def test_pallas_interpret_matches_jnp():
    """Force the Pallas kernels (interpret mode on CPU) and compare the
    full fwd+bwd against the pure-jnp path, on a non-block-aligned N."""
    groups, c = 8, 64
    x, gamma, beta, scale, shift = _setup(groups, c, True, spatial=(3, 11, 13))

    def run(x, gamma, beta, scale, shift):
        def loss(*a):
            o = gn_film_silu(*a, groups=groups)
            return jnp.sum(jnp.cos(o) * o)

        return loss(x, gamma, beta, scale, shift), jax.grad(
            loss, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, scale, shift)

    prev = os.environ.get("WDNO_FUSED_GN")
    try:
        os.environ["WDNO_FUSED_GN"] = "0"
        l0, g0 = run(x, gamma, beta, scale, shift)
        os.environ["WDNO_FUSED_GN"] = "1"
        l1, g1 = run(x, gamma, beta, scale, shift)
    finally:
        if prev is None:
            os.environ.pop("WDNO_FUSED_GN", None)
        else:
            os.environ["WDNO_FUSED_GN"] = prev
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b_, name in zip(g0, g1, ["dx", "dgamma", "dbeta", "dscale", "dshift"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=3e-4, err_msg=name)


def test_convblock_param_tree_stable():
    """ConvBlock must keep the nn.GroupNorm param names (checkpoints +
    torch converter depend on GroupNorm_0/{scale,bias})."""
    from wdno_tpu.models.layers import ConvBlock

    m = ConvBlock(dim_out=16, groups=8, spatial_rank=2)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 16)))["params"]
    assert set(params.keys()) == {"Conv_0", "GroupNorm_0"}, params.keys()
    assert set(params["GroupNorm_0"].keys()) == {"scale", "bias"}
    assert params["GroupNorm_0"]["scale"].shape == (16,)
