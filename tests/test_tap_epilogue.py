"""Tap-sum/tap-pack Pallas epilogues vs the jnp oracle path, and the
bias-carrying packed conv against XLA's native conv3d (incl. all grads)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wdno_tpu.ops import conv3d_packed as cp
from wdno_tpu.ops.tap_epilogue import tap_pack, tap_sum


@pytest.mark.parametrize("kd", [3, 5])
def test_tap_sum_matches_jnp_oracle(kd):
    rng = np.random.default_rng(0)
    B, F, H, W, co = 2, 6, 8, 8, 16
    y = jnp.asarray(rng.standard_normal((B * F, H, W, kd * co)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
    ref = cp._taps_to_frames(y, kd, co, F) + bias
    out = tap_sum(y, bias, kd=kd, co=co, f=F)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_tap_pack_matches_shift_frames_concat():
    rng = np.random.default_rng(1)
    B, F, H, W, co, kd = 2, 5, 8, 8, 16, 3
    g = jnp.asarray(rng.standard_normal((B, F, H, W, co)), jnp.float32)
    ctr = kd // 2
    ref = jnp.concatenate(
        [cp._shift_frames(g, ctr - dt) for dt in range(kd)], axis=-1
    ).reshape(B * F, H, W, kd * co)
    out = tap_pack(g.reshape(B * F, H, W, co), kd=kd, co=co, f=F)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_tap_sum_pack_block_grid_interior_halos():
    """n large enough that the v2 block path runs a multi-step grid, so the
    single-row halo reads cross block boundaries (and frame boundaries land
    in block interiors)."""
    rng = np.random.default_rng(7)
    B, F, H, W, co, kd = 8, 6, 8, 8, 16, 3  # n=48 -> nb=16, grid 3
    n = B * F
    y = jnp.asarray(rng.standard_normal((n, H, W, kd * co)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(tap_sum(y, bias, kd=kd, co=co, f=F)),
        np.asarray(cp._taps_to_frames(y, kd, co, F) + bias), atol=1e-6)
    g = jnp.asarray(rng.standard_normal((B, F, H, W, co)), jnp.float32)
    ctr = kd // 2
    ref = jnp.concatenate(
        [cp._shift_frames(g, ctr - dt) for dt in range(kd)], axis=-1
    ).reshape(n, H, W, kd * co)
    np.testing.assert_allclose(
        np.asarray(tap_pack(g.reshape(n, H, W, co), kd=kd, co=co, f=F)),
        np.asarray(ref), atol=1e-6)


def test_tap_sum_pack_adjoint():
    rng = np.random.default_rng(2)
    BF, H, W, kd, co, F = 10, 4, 4, 3, 8, 5
    y = jnp.asarray(rng.standard_normal((BF, H, W, kd * co)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((BF, H, W, co)), jnp.float32)
    lhs = jnp.vdot(tap_sum(y, None, kd=kd, co=co, f=F), g)
    rhs = jnp.vdot(y, tap_pack(g, kd=kd, co=co, f=F))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


@pytest.mark.parametrize("epilogue", ["0", "1"])
def test_packed_conv3d_bias_and_grads_vs_native(epilogue, monkeypatch):
    monkeypatch.setenv("WDNO_TAP_EPILOGUE", epilogue)
    rng = np.random.default_rng(3)
    B, F, H, W, ci, co, kd = 2, 5, 8, 8, 6, 16, 3
    x = jnp.asarray(rng.standard_normal((B, F, H, W, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kd, 3, 3, ci, co)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((co,)), jnp.float32)

    def native(x, k, b):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME", dimension_numbers=dn) + b

    g = jnp.asarray(rng.standard_normal((B, F, H, W, co)), jnp.float32)
    ref = jax.value_and_grad(
        lambda x, k, b: jnp.vdot(native(x, k, b), g), argnums=(0, 1, 2))(x, k, bias)
    new = jax.value_and_grad(
        lambda x, k, b: jnp.vdot(cp.packed_conv3d(x, k, b), g),
        argnums=(0, 1, 2))(x, k, bias)
    np.testing.assert_allclose(float(new[0]), float(ref[0]), rtol=1e-4)
    for a, b in zip(new[1], ref[1]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4,
            atol=2e-4 * float(jnp.abs(b).max()))


def test_tap_sum_bf16_v1_vs_v2_tolerance(monkeypatch):
    """ADVICE r3: the v2 block kernel accumulates the 3-tap sum + bias in
    the INPUT dtype (bf16 in training; f32 temps blow the 16M scoped-VMEM
    limit at the level-0 shape), while the v1 per-row path accumulates in
    f32 — and which path runs is a shape-dependent switch (_pick_nb).  Pin
    the bf16 discrepancy: both paths must sit within ~2 bf16 ulps of the
    f32 oracle, i.e. the switch can never change results by more than
    normal bf16 rounding noise."""
    import wdno_tpu.ops.tap_epilogue as te

    rng = np.random.default_rng(3)
    B, F, H, W, co, kd = 8, 6, 8, 8, 16, 3  # n=48 -> v2 picks nb=16
    n = B * F
    y32 = rng.standard_normal((n, H, W, kd * co)).astype(np.float32)
    b32 = rng.standard_normal((co,)).astype(np.float32)
    y = jnp.asarray(y32, jnp.bfloat16)
    bias = jnp.asarray(b32, jnp.bfloat16)
    oracle = np.asarray(
        cp._taps_to_frames(jnp.asarray(y32), kd, co, F) + jnp.asarray(b32))

    # disable_jit: tap_sum is jitted and _pick_nb runs at TRACE time, so a
    # monkeypatched switch would otherwise be defeated by the jit cache
    with jax.disable_jit():
        v2 = np.asarray(tap_sum(y, bias, kd=kd, co=co, f=F), np.float32)
        monkeypatch.setattr(te, "_pick_nb", lambda *a, **k: 0)  # force v1
        v1 = np.asarray(te.tap_sum(y, bias, kd=kd, co=co, f=F), np.float32)
    assert not np.array_equal(v1, v2)  # proves the two kernels both ran

    # |sum| <= ~4 here; one bf16 ulp at 4 is 0.03125 -> 2 ulps + input
    # quantization gives ~0.07 worst case
    np.testing.assert_allclose(v1, oracle, atol=0.08)
    np.testing.assert_allclose(v2, oracle, atol=0.08)
    np.testing.assert_allclose(v1, v2, atol=0.08)


@pytest.mark.parametrize("fn", ["sum", "pack"])
def test_vmem_overflow_shapes_fall_back_to_xla(fn):
    """Shapes whose per-row footprint exceeds the 16 MB scoped-VMEM limit
    (the super SR chain's level-1 80x80 grids — caught live by the r5 warm
    run as a Mosaic stack OOM) must route to the XLA path and still match
    the oracle."""
    from wdno_tpu.ops.tap_epilogue import _pick_nb, _v1_fits

    rng = np.random.default_rng(3)
    B, F, H, W, co, kd = 2, 3, 64, 64, 64, 3
    n = B * F
    row_in = H * W * kd * co * 4
    assert _pick_nb(n, row_in) == 0  # v2 block path ruled out
    assert not _v1_fits(row_in, H * W * co * 4, kd, (kd + 2) * H * W * co * 4)
    if fn == "sum":
        y = jnp.asarray(rng.standard_normal((n, H, W, kd * co)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
        out = tap_sum(y, bias, kd=kd, co=co, f=F)
        ref = cp._taps_to_frames(y, kd, co, F) + bias
    else:
        g = jnp.asarray(rng.standard_normal((n, H, W, co)), jnp.float32)
        out = tap_pack(g, kd=kd, co=co, f=F)
        ctr = kd // 2
        g5 = g.reshape(B, F, H, W, co)
        ref = jnp.concatenate(
            [cp._shift_frames(g5, ctr - dt) for dt in range(kd)], axis=-1
        ).reshape(n, H, W, kd * co)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
