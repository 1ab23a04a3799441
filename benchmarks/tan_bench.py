"""Microbenchmark: temporal-attention kernel variants at the bench shape.

Times forward and forward+backward of the native-layout temporal attention
custom-VJP (``ops/attention_pallas._tan``) on the real chip, per variant
(env WDNO_TAN_HG selects the head-grouped score matmuls).  Pauses campaign
process groups like bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wdno_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from bench import _PauseCampaign
    from wdno_tpu.ops.attention_pallas import temporal_attention_native

    B, F, H, W, heads, dh = 6, 24, 40, 40, 4, 32
    hd = heads * dh
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, F, H, W, 3 * hd),
                            jnp.bfloat16)
    bias = jax.random.normal(jax.random.PRNGKey(1), (heads, F, F), jnp.float32)

    fwd = jax.jit(lambda qkv, bias: temporal_attention_native(
        qkv, bias, heads=heads, dim_head=dh, scale=dh ** -0.5))

    def loss(qkv, bias):
        return jnp.sum(jnp.square(temporal_attention_native(
            qkv, bias, heads=heads, dim_head=dh, scale=dh ** -0.5
        ).astype(jnp.float32)))

    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))

    # host transfers as barriers: the tunneled backend's block_until_ready
    # can return before the program finishes (see bench.py)
    sync = lambda t: float(jnp.asarray(t).ravel()[0])
    o = fwd(qkv, bias); sync(o)
    g = grad(qkv, bias); sync(g[0])
    iters = 30
    with _PauseCampaign():
        o = fwd(qkv, bias); sync(o)
        t0 = time.time()
        for _ in range(iters):
            o = fwd(qkv, bias)
        sync(o)
        t_fwd = (time.time() - t0) / iters
        g = grad(qkv, bias); sync(g[0])
        t0 = time.time()
        for _ in range(iters):
            g = grad(qkv, bias)
        sync(g[0])
        t_fg = (time.time() - t0) / iters
    print(f"variant WDNO_TAN_HG={os.environ.get('WDNO_TAN_HG', '0')}: "
          f"fwd {t_fwd * 1e3:.2f} ms, fwd+bwd {t_fg * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
