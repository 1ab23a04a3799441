"""Wavelet kernel benchmark: conv vs matrix vs fused-Pallas paths on TPU.

Measures throughput of the three DWT implementations on the framework's
canonical shapes; run on a free TPU chip:
``python benchmarks/wavelet_bench.py``.
"""

import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, x, iters=20):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(iters):
        y = fn(x)
    jax.block_until_ready(y)
    dt = (time.time() - t0) / iters
    gb = x.size * x.dtype.itemsize / 1e9
    return dt * 1e3, gb / dt


def main():
    from wdno_tpu.ops import wavelet as Wc
    from wdno_tpu.ops import wavelet_fast as Wm

    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    for shape, wave, mode in [
        ((512, 2, 81, 120), "bior2.4", "periodization"),
        ((256, 5, 64, 64), "bior1.3", "zero"),
    ]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        conv = jax.jit(lambda v: Wc.dwt2d(v, wave, mode))
        matm = jax.jit(lambda v: Wm.dwt2d(v, wave, mode))
        print(f"shape {shape} {wave}/{mode}:")
        for name, fn in (("conv", conv), ("matmul", matm)):
            try:
                ms, gbs = bench(fn, x)
                print(f"  {name:>7}: {ms:8.2f} ms   {gbs:7.1f} GB/s")
            except Exception as e:  # pragma: no cover
                print(f"  {name:>7}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
