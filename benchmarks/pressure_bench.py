"""Pressure-solver cross-validation + timing harness.

The TPU-native analogue of the reference's CUDA-vs-SciPy harness
(``phi/solver/cuda/benchmarks/floatingerror.py:1-79`` and
``benchmark_utils.benchmark_error/benchmark_pressure_solve:20-192``):
compares the stencil-CG device solver against an independent scipy dense
solve over a sweep of grid sizes, reporting abs/rel error and wall-clock.

Run: ``python benchmarks/pressure_bench.py [--sizes 16 32 64 128] [--runs 5]``
"""

import argparse
import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def scipy_reference(active, fluid, rhs):
    """Independent dense ground truth: minimum-norm least-squares solve of
    the singular Neumann system (float64)."""
    n, m = active.shape
    a = np.pad(active, 1)
    fl = np.pad(fluid, 1)
    N = n * m
    A = np.zeros((N, N))
    for y in range(n):
        for x in range(m):
            i = y * m + x
            cy, cx = y + 1, x + 1
            center = -(fl[cy + 1, cx] + fl[cy - 1, cx] + fl[cy, cx + 1] + fl[cy, cx - 1])
            A[i, i] = min(center, -1.0)
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                yy, xx = y + dy, x + dx
                if 0 <= yy < n and 0 <= xx < m:
                    A[i, yy * m + xx] = a[cy + dy, cx + dx] * a[cy, cx]
    x, *_ = np.linalg.lstsq(A, rhs.ravel().astype(np.float64), rcond=None)
    return x.reshape(n, m), A


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[16, 32, 64, 127])
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--accuracy", type=float, default=1e-5)
    args = ap.parse_args()

    from wdno_tpu.solvers.smoke.pressure import apply_laplace, build_stencil, conjugate_gradient

    rng = np.random.default_rng(0)
    print(f"{'grid':>6} {'iters':>6} {'abs_err':>12} {'rel_err':>12} "
          f"{'res_inf':>12} {'t_solve':>10}")
    for n in args.sizes:
        fluid = np.ones((n, n), np.float32)
        # random obstacles like the smoke maze
        for _ in range(max(1, n // 16)):
            y, x = rng.integers(1, n - 2, 2)
            fluid[y, x : min(x + n // 4, n - 1)] = 0
        active = fluid.copy()
        st = build_stencil(
            jnp.asarray(np.pad(active, 1)[None, :, :, None]),
            jnp.asarray(np.pad(fluid, 1)[None, :, :, None]),
        )
        # consistent RHS: zero-mean over EVERY connected fluid component
        # (each component contributes one constant nullspace mode)
        import scipy.ndimage as ndi

        rhs = rng.standard_normal((n, n)).astype(np.float32) * fluid
        labels0, ncomp0 = ndi.label(fluid > 0)
        for c in range(1, ncomp0 + 1):
            m = labels0 == c
            rhs[m] -= rhs[m].mean()

        solve = jax.jit(
            lambda b: conjugate_gradient(b, st, args.accuracy, 4 * n * n)
        )
        x, iters = solve(jnp.asarray(rhs[None]))
        jax.block_until_ready(x)
        t0 = time.time()
        for _ in range(args.runs):
            x, iters = solve(jnp.asarray(rhs[None]))
        jax.block_until_ready(x)
        dt = (time.time() - t0) / args.runs

        res = np.asarray(apply_laplace(st, x)) - rhs[None]
        ref, _ = scipy_reference(active, fluid, rhs)
        ours = np.asarray(x[0])
        # the closed-domain Neumann Laplacian has one constant-nullspace
        # mode PER connected fluid component: match means component-wise
        import scipy.ndimage as ndi

        labels, ncomp = ndi.label(fluid > 0)
        ours_c, ref_c = ours.copy(), ref.copy()
        for c in range(1, ncomp + 1):
            m = labels == c
            ours_c[m] -= ours_c[m].mean()
            ref_c[m] -= ref_c[m].mean()
        mask = fluid > 0
        abs_err = np.abs((ours_c - ref_c)[mask]).max()
        rel_err = abs_err / max(np.abs(ref_c[mask]).max(), 1e-12)
        print(f"{n:>6} {int(iters):>6} {abs_err:>12.3e} {rel_err:>12.3e} "
              f"{np.abs(res).max():>12.3e} {dt*1e3:>9.2f}ms")


if __name__ == "__main__":
    main()
