"""Wavelet transform unit tests.

The reference only *prints* reconstruction errors during data prep
(``wave_trans.py:109-112``, ``wave_trans_2d.py:132-133``); here they are
asserted.  A slow numpy direct-summation DWT serves as an independent oracle
for the convolution implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from wdno_tpu.ops import wavelet as W
from wdno_tpu.ops import packing as P

WAVES = ["haar", "db4", "db5", "sym4", "bior1.3", "bior2.2", "bior2.4", "bior4.4"]
MODES = ["zero", "periodization"]


def _naive_dwt(x: np.ndarray, wave: W.Wavelet, mode: str):
    """Direct-summation reference: a[k] = sum_j dec[j] x[2k+1-j]."""
    n = x.shape[-1]
    F = wave.filter_len
    if mode == "periodization":
        if n % 2:
            x = np.concatenate([x, x[..., -1:]], -1)
            n += 1
        L = n // 2

        def at(i):
            return x[..., i % n]

    else:
        L = (n + F - 1) // 2

        def at(i):
            if 0 <= i < n:
                return x[..., i]
            return np.zeros(x.shape[:-1])

    a = np.zeros(x.shape[:-1] + (L,))
    d = np.zeros_like(a)
    for k in range(L):
        for j in range(F):
            idx = 2 * k + 1 - j
            a[..., k] += wave.dec_lo[j] * at(idx)
            d[..., k] += wave.dec_hi[j] * at(idx)
    return a, d


@pytest.mark.parametrize("wave", WAVES)
def test_filter_identities(wave):
    w = W.get_wavelet(wave)
    # lowpass filters sum to sqrt(2); highpass to 0
    assert abs(w.dec_lo.sum() - np.sqrt(2)) < 1e-10
    assert abs(w.rec_lo.sum() - np.sqrt(2)) < 1e-10
    assert abs(w.dec_hi.sum()) < 1e-10
    assert abs(w.rec_hi.sum()) < 1e-10


@pytest.mark.parametrize("wave", ["haar", "bior1.3", "bior2.4", "db4"])
@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("n", [16, 33])
def test_matches_naive_oracle(wave, mode, n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, n))
    w = W.get_wavelet(wave)
    a_ref, d_ref = _naive_dwt(x, w, mode)
    a, d = W.dwt1d(jnp.asarray(x, jnp.float32), w, mode)
    np.testing.assert_allclose(np.asarray(a), a_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=2e-5)


@pytest.mark.parametrize("wave", WAVES)
@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("n", [33, 64])
def test_perfect_reconstruction_1d(wave, mode, n):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, n)).astype(np.float32)
    a, d = W.dwt1d(jnp.asarray(x), wave, mode)
    F = W.get_wavelet(wave).filter_len
    assert a.shape[-1] == W.coef_len(n, F, mode)
    y = np.asarray(W.idwt1d(a, d, wave, mode))
    if mode == "periodization" and n % 2:
        # odd lengths are repeat-extended before the transform
        x_cmp = np.concatenate([x, x[:, -1:]], -1)
        np.testing.assert_allclose(y, x_cmp, atol=5e-5)
    else:
        np.testing.assert_allclose(y[:, :n], x, atol=5e-5)


def test_burgers_shapes_bior24_periodization():
    """The Burgers pipeline contract: 81x120 -> 41x60 coefficients."""
    x = jnp.ones((4, 2, 81, 120))
    aa, (ad, da, dd) = W.dwt2d(x, "bior2.4", "periodization")
    assert aa.shape == (4, 2, 41, 60)
    y = W.idwt2d(aa, (ad, da, dd), "bior2.4", "periodization")
    assert y.shape[-2:] == (82, 120)


def test_smoke_shapes_bior13_zero():
    """The smoke pipeline contract: (32,64,64) -> (18,34,34) coefficients."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((5, 32, 64, 64)), jnp.float32)
    ap, det = W.dwt3d(x, "bior1.3", "zero")
    assert ap.shape == (5, 18, 34, 34)
    assert set(det) == {"aad", "ada", "add", "daa", "dad", "dda", "ddd"}
    y = np.asarray(W.idwt3d(ap, det, "bior1.3", "zero"))
    np.testing.assert_allclose(y[:, :32, :64, :64], np.asarray(x), atol=1e-4)
    # downsampled variants used by the super model
    for i in (1, 2):
        ap_i, _ = W.dwt3d(x[:, :: 2**i], "bior1.3", "zero")
        assert ap_i.shape[1] == W.coef_len(-(-32 // 2**i), 6, "zero")


def test_2d_reconstruction_periodization():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 2, 80, 120)), jnp.float32)
    aa, det = W.dwt2d(x, "bior2.4", "periodization")
    y = np.asarray(W.idwt2d(aa, det, "bior2.4", "periodization"))
    np.testing.assert_allclose(y, np.asarray(x), atol=1e-4)


def test_multilevel_1d_roundtrip():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, 120)), jnp.float32)
    a, ds = W.wavedec1d(x, "bior2.4", "periodization", level=3)
    assert a.shape[-1] == 15
    y = np.asarray(W.waverec1d(a, ds, "bior2.4", "periodization"))
    np.testing.assert_allclose(y[:, :120], np.asarray(x), atol=1e-4)


def test_dwt_max_level():
    assert W.dwt_max_level(80, "bior2.4") == 3  # floor(log2(80/9))
    assert W.dwt_max_level(32, "bior1.3") == 2  # floor(log2(32/5))


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 32, 64, 64)), jnp.float32)
    ap, det = W.dwt3d(x, "bior1.3", "zero")
    packed = P.pack3d(ap, det)
    assert packed.shape == (2, 18, 34, 34, 8)
    ap2, det2 = P.unpack3d(packed)
    y = np.asarray(W.idwt3d(ap2, det2, "bior1.3", "zero"))
    np.testing.assert_allclose(y[:, :32, :64, :64], np.asarray(x), atol=1e-4)

    aa, det2d = W.dwt2d(x[:, 0], "bior2.4", "periodization")
    packed2 = P.pack2d(aa, det2d)
    assert packed2.shape == (2, 32, 32, 4)
    aa2, det2d2 = P.unpack2d(packed2)
    y2 = np.asarray(W.idwt2d(aa2, det2d2, "bior2.4", "periodization"))
    np.testing.assert_allclose(y2, np.asarray(x[:, 0]), atol=1e-4)


def test_upsample_coef():
    w = jnp.arange(12.0).reshape(1, 2, 3, 2)  # [N, H, W, C]-ish
    up = P.upsample_coef2d(w, axes=(1, 2))
    assert up.shape == (1, 4, 6, 2)
    np.testing.assert_array_equal(np.asarray(up[0, :, :, 0]),
                                  np.repeat(np.repeat(np.asarray(w[0, :, :, 0]), 2, 0), 2, 1))
    w3 = jnp.ones((1, 4, 3, 3, 8))
    assert P.upsample_coef3d(w3, "time", axes=(1, 2, 3)).shape == (1, 8, 3, 3, 8)
    assert P.upsample_coef3d(w3, "space", axes=(1, 2, 3)).shape == (1, 4, 6, 6, 8)


def test_pad_to():
    x = jnp.ones((2, 41, 60, 8))
    y = P.pad_to(x, (64, 64), axes=(1, 2))
    assert y.shape == (2, 64, 64, 8)
    assert float(y[0, 50, 50, 0]) == 0.0
