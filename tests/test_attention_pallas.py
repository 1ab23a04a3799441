"""Fused Pallas attention: forward/backward parity vs the einsum lowering
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from wdno_tpu.models.layers import Attention, apply_rotary, apply_rotary_packed
from wdno_tpu.ops.attention_pallas import fused_attention


def _ref_attention(q, k, v, bias, heads):
    n, s, hd = q.shape
    d = hd // heads

    def split(y):
        return y.reshape(n, s, heads, d).transpose(0, 2, 1, 3).astype(jnp.float32)

    qh, kh, vh = split(q), split(k), split(v)
    sim = jnp.einsum("nhid,nhjd->nhij", qh, kh) + bias[None]
    p = jax.nn.softmax(sim, axis=-1)
    o = jnp.einsum("nhij,nhjd->nhid", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(n, s, hd)


def test_fused_attention_forward_matches_einsum():
    rng = np.random.default_rng(0)
    n, s, heads, d = 24, 12, 4, 8
    q, k, v = (jnp.asarray(rng.standard_normal((n, s, heads * d)), jnp.float32) for _ in range(3))
    bias = jnp.asarray(rng.standard_normal((heads, s, s)), jnp.float32)
    out = fused_attention(q, k, v, bias, heads=heads)
    ref = _ref_attention(q, k, v, bias, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_grads_match():
    rng = np.random.default_rng(1)
    n, s, heads, d = 16, 6, 2, 8
    q, k, v = (jnp.asarray(rng.standard_normal((n, s, heads * d)), jnp.float32) for _ in range(3))
    bias = jnp.asarray(rng.standard_normal((heads, s, s)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((n, s, heads * d)), jnp.float32)

    def loss_fused(q, k, v, b):
        return (fused_attention(q, k, v, b, heads=heads) * w).sum()

    def loss_ref(q, k, v, b):
        return (_ref_attention(q, k, v, b, heads) * w).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(gf, gr, "qkvb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, err_msg=name)


def test_fused_attention_pads_ragged_sites():
    rng = np.random.default_rng(2)
    n, s, heads, d = 13, 5, 2, 4  # n not a multiple of any block
    q, k, v = (jnp.asarray(rng.standard_normal((n, s, heads * d)), jnp.float32) for _ in range(3))
    out = fused_attention(q, k, v, None, heads=heads)
    ref = _ref_attention(q, k, v, jnp.zeros((heads, s, s)), heads)
    assert out.shape == (n, s, heads * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_rotary_packed_matches_per_head():
    rng = np.random.default_rng(3)
    n, s, heads, d = 4, 10, 4, 8
    x = jnp.asarray(rng.standard_normal((n, s, heads * d)), jnp.float32)
    packed = apply_rotary_packed(x, heads)
    split = x.reshape(n, s, heads, d).transpose(0, 2, 1, 3)
    ref = apply_rotary(split).transpose(0, 2, 1, 3).reshape(n, s, heads * d)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref), atol=1e-6)


def test_attention_module_fused_matches_einsum_path():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 3, 8, 32)), jnp.float32)  # [b, hw, f, c]
    bias = jnp.asarray(0.1 * rng.standard_normal((2, 8, 8)), jnp.float32)
    m_f = Attention(heads=2, dim_head=8, use_rotary=True, fused=True)
    m_e = Attention(heads=2, dim_head=8, use_rotary=True, fused=False)
    params = m_f.init(jax.random.PRNGKey(0), x, bias)
    out_f = m_f.apply(params, x, bias)
    out_e = m_e.apply(params, x, bias)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e), atol=3e-5)


def test_fused_linear_attention_matches_einsum():
    from wdno_tpu.models.layers import LinearAttention

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((3, 20, 16)), jnp.float32)
    m_f = LinearAttention(heads=2, dim_head=8, fused=True)
    m_e = LinearAttention(heads=2, dim_head=8, fused=False)
    params = m_f.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(m_f.apply(params, x)), np.asarray(m_e.apply(params, x)), atol=3e-5
    )
    # gradients agree too
    gf = jax.grad(lambda p: (m_f.apply(p, x) ** 2).sum())(params)
    ge = jax.grad(lambda p: (m_e.apply(p, x) ** 2).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(ge)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


# ---------------------------------------------------------------------------
# native-layout temporal attention


def _ref_temporal(qkv, bias, heads, dim_head):
    """Transposed reference: rotary(scale*q), rotary(k), softmax(qk+b)v."""
    b, f, h, w, hd3 = qkv.shape
    hd = hd3 // 3
    qf = qkv.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, hd3)
    q, k, v = jnp.split(qf.astype(jnp.float32), 3, axis=-1)
    q = apply_rotary_packed(q * dim_head**-0.5, heads)
    k = apply_rotary_packed(k, heads)
    o = _ref_attention(q, k, v, bias.astype(jnp.float32), heads)
    return o.reshape(b, h, w, f, hd).transpose(0, 3, 1, 2, 4)


def test_temporal_attention_native_forward_matches_transposed():
    from wdno_tpu.ops.attention_pallas import temporal_attention_native

    rng = np.random.default_rng(3)
    b, f, h, w, heads, d = 2, 6, 3, 8, 4, 8
    qkv = jnp.asarray(rng.standard_normal((b, f, h, w, 3 * heads * d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, f, f)), jnp.float32)
    out = temporal_attention_native(qkv, bias, heads=heads, dim_head=d,
                                    scale=d**-0.5)
    assert out is not None
    ref = _ref_temporal(qkv, bias, heads, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_temporal_attention_native_grads_match():
    from wdno_tpu.ops.attention_pallas import temporal_attention_native

    rng = np.random.default_rng(4)
    b, f, h, w, heads, d = 1, 5, 2, 8, 2, 8
    qkv = jnp.asarray(rng.standard_normal((b, f, h, w, 3 * heads * d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, f, f)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, f, h, w, heads * d)), jnp.float32)

    def loss_native(qkv, bias):
        return (temporal_attention_native(qkv, bias, heads=heads, dim_head=d,
                                          scale=d**-0.5) * cot).sum()

    def loss_ref(qkv, bias):
        return (_ref_temporal(qkv, bias, heads, d) * cot).sum()

    gn = jax.grad(loss_native, argnums=(0, 1))(qkv, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    for a, b_, name in zip(gn, gr, ("qkv", "bias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5,
                                   err_msg=name)


def test_attention_module_native_video_matches_transposed_module():
    """The Attention module's native-video path equals the sequence path."""
    rng = np.random.default_rng(5)
    b, f, h, w, c, heads, d = 1, 4, 2, 8, 16, 2, 8
    x = jnp.asarray(rng.standard_normal((b, f, h, w, c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, f, f)), jnp.float32)
    native = Attention(heads=heads, dim_head=d, use_rotary=True,
                       native_video=True)
    seq = Attention(heads=heads, dim_head=d, use_rotary=True, fused=False)
    params = native.init(jax.random.PRNGKey(0), x, bias)
    out_n = native.apply(params, x, bias)
    xs = x.transpose(0, 2, 3, 1, 4).reshape(b, h * w, f, c)
    out_s = seq.apply(params, xs, bias)
    out_s = out_s.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_s), atol=3e-5)


def test_head_grouped_temporal_attention_parity(monkeypatch):
    """WDNO_TAN_HG=1 (head-grouped score matmuls) must match the per-head
    kernel exactly, fwd and grads (it is a measured A/B alternative)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import wdno_tpu.ops.attention_pallas as AP

    B, F, H, W, heads, dh = 2, 6, 4, 8, 4, 8
    hd = heads * dh
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, F, H, W, 3 * hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, F, F)), jnp.float32)

    def loss(qkv, bias):
        return jnp.sum(jnp.square(AP.temporal_attention_native(
            qkv, bias, heads=heads, dim_head=dh, scale=dh ** -0.5)))

    monkeypatch.setenv("WDNO_TAN_HG", "0")
    o0 = AP.temporal_attention_native(qkv, bias, heads=heads, dim_head=dh,
                                      scale=dh ** -0.5)
    g0 = jax.grad(loss, argnums=(0, 1))(qkv, bias)
    monkeypatch.setenv("WDNO_TAN_HG", "1")
    o1 = AP.temporal_attention_native(qkv, bias, heads=heads, dim_head=dh,
                                      scale=dh ** -0.5)
    g1 = jax.grad(loss, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g0[0]), np.asarray(g1[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]), atol=2e-4)
