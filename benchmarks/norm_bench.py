"""GroupNorm+FiLM+SiLU lowering A/B at the smoke bench configuration.

Three lowerings of the exact ConvBlock epilogue (fwd + dx, jitted):
  flax   — nn.GroupNorm -> FiLM -> silu as composed modules (what the r1
           code shipped; XLA reduces over a reshaped [..., G, C/G] layout
           whose minor dim is 8 -> ~6% lane utilization)
  xla    — ops/norm_pallas.py's restructured form (channel-last stats,
           normalize+FiLM collapsed to x*A+B), WDNO_FUSED_GN=0
  pallas — the same math as explicit Pallas kernels, WDNO_FUSED_GN=1

Run on the chip: python benchmarks/norm_bench.py
r2 measurements (TPU v5e, [6,24,40,40,64] bf16, groups 8):
  xla 1.79 ms   pallas 2.48 ms  -> the xla form is the default.  (The r2
  step profile attributes ~1.7 ms to EACH of the six flax-form stat reduces
  inside the full train step; this script measures the flax composite
  directly for the standalone comparison.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/wdno_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wdno_tpu.ops.norm_pallas import gn_film_silu

B, F, H, W, C, G = 6, 24, 40, 40, 64, 8


def _flax_epilogue(x, gamma, beta, scale, shift):
    y = nn.GroupNorm(num_groups=G, epsilon=1e-5, dtype=x.dtype).apply(
        {"params": {"scale": gamma, "bias": beta}}, x)
    y = y * (scale[:, None, None, None, :] + 1) + shift[:, None, None, None, :]
    return nn.silu(y)


def _timed(name, fn, args, iters=30):
    f = jax.jit(lambda *a: jax.value_and_grad(
        lambda *b: jnp.sum(fn(*b).astype(jnp.float32) ** 2), argnums=(0,))(*a))
    r = f(*args)
    jax.block_until_ready(r[0])
    t0 = time.time()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r[0])
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name:7s} fwd+dx {ms:7.3f} ms")
    return ms


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, F, H, W, C)), jnp.bfloat16)
    gamma = jnp.asarray(rng.standard_normal(C) * 0.2 + 1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.standard_normal((B, C)) * 0.3, jnp.bfloat16)
    shift = jnp.asarray(rng.standard_normal((B, C)) * 0.3, jnp.bfloat16)
    args = (x, gamma, beta, scale, shift)

    _timed("flax", _flax_epilogue, args)
    os.environ["WDNO_FUSED_GN"] = "0"
    _timed("xla", lambda *a: gn_film_silu(*a, groups=G), args)
    os.environ["WDNO_FUSED_GN"] = "1"
    _timed("pallas", lambda *a: gn_film_silu(*a, groups=G), args)


if __name__ == "__main__":
    main()
