"""Matrix-form wavelet path must match the conv reference exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from wdno_tpu.ops import wavelet as Wref
from wdno_tpu.ops import wavelet_fast as Wf


@pytest.mark.parametrize("wave,mode,n", [
    ("bior2.4", "periodization", 81),
    ("bior2.4", "periodization", 120),
    ("bior1.3", "zero", 64),
    ("bior1.3", "zero", 32),
])
def test_matrix_matches_conv_1d(wave, mode, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
    a0, d0 = Wref.dwt1d(x, wave, mode)
    a1, d1 = Wf.dwt1d(x, wave, mode)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=2e-5)
    y0 = Wref.idwt1d(a0, d0, wave, mode)
    y1 = Wf.idwt1d(a0, d0, wave, mode)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-5)


def test_matrix_matches_conv_2d_3d():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 2, 81, 120)), jnp.float32)
    aa0, det0 = Wref.dwt2d(x, "bior2.4", "periodization")
    aa1, det1 = Wf.dwt2d(x, "bior2.4", "periodization")
    np.testing.assert_allclose(np.asarray(aa1), np.asarray(aa0), atol=2e-5)
    for b0, b1 in zip(det0, det1):
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), atol=2e-5)
    y1 = Wf.idwt2d(aa1, det1, "bior2.4", "periodization")
    np.testing.assert_allclose(np.asarray(y1)[..., :80, :], np.asarray(x)[..., :80, :], atol=1e-4)

    x3 = jnp.asarray(rng.standard_normal((2, 16, 32, 32)), jnp.float32)
    ap0, d3_0 = Wref.dwt3d(x3, "bior1.3", "zero")
    ap1, d3_1 = Wf.dwt3d(x3, "bior1.3", "zero")
    np.testing.assert_allclose(np.asarray(ap1), np.asarray(ap0), atol=2e-5)
    for k in d3_0:
        np.testing.assert_allclose(np.asarray(d3_1[k]), np.asarray(d3_0[k]), atol=2e-5)
    y3 = Wf.idwt3d(ap1, d3_1, "bior1.3", "zero")
    np.testing.assert_allclose(
        np.asarray(y3)[:, :16, :32, :32], np.asarray(x3), atol=1e-4
    )
