import functools

import numpy as np

import jax.numpy as jnp

from dy4tpu.ops import fft


RNG = np.random.default_rng(11)


def test_dft_matches_numpy():
    x = RNG.normal(size=64).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fft.dft(jnp.asarray(x))),
                               np.fft.fft(x), atol=1e-3)


def test_idft_inverts_dft():
    x = RNG.normal(size=128).astype(np.float32)
    rt = fft.idft(fft.dft(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(rt).real, x, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rt).imag, 0, atol=1e-3)


def test_fft_radix2_matches_numpy():
    for n in (8, 64, 512):
        x = (RNG.normal(size=n) + 1j * RNG.normal(size=n)).astype(np.complex64)
        got = np.asarray(fft.fft_radix2(jnp.asarray(x)))
        np.testing.assert_allclose(got, np.fft.fft(x), atol=1e-2)


def test_fft_radix2_batched():
    x = RNG.normal(size=(5, 256)).astype(np.float32)
    got = np.asarray(fft.fft_radix2(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.fft.fft(x, axis=-1), atol=1e-2)


def test_ifft_radix2_roundtrip():
    x = (RNG.normal(size=512) + 1j * RNG.normal(size=512)).astype(np.complex64)
    rt = np.asarray(fft.ifft_radix2(fft.fft_radix2(jnp.asarray(x))))
    np.testing.assert_allclose(rt, x, atol=1e-3)


def test_estimate_psd_finds_tone():
    fs = 48e3
    t = np.arange(8192) / fs
    x = np.sin(2 * np.pi * 6e3 * t).astype(np.float32)
    freq, psd = fft.estimate_psd(jnp.asarray(x), nfft=512, fs=fs)
    psd = np.asarray(psd)
    assert freq.shape == (256,) and psd.shape == (256,)
    peak = freq[psd.argmax()]
    assert abs(peak - 6e3) < fs / 512


def test_estimate_psd_matches_naive_bartlett():
    fs = 1e3
    x = RNG.normal(size=2048).astype(np.float32)
    freq, psd = fft.estimate_psd(jnp.asarray(x), nfft=512, fs=fs)

    # naive Bartlett in dB (fmSupportLib.py:86-161 semantics)
    hann = np.sin(np.arange(512) * np.pi / 512) ** 2
    segs = []
    for k in range(len(x) // 512):
        xf = np.fft.fft(x[k * 512:(k + 1) * 512] * hann)[:256]
        p = 2 * (np.abs(xf) ** 2) / (fs * 256)
        segs.append(10 * np.log10(p))
    ref = np.mean(segs, axis=0)
    np.testing.assert_allclose(np.asarray(psd), ref, atol=1e-2)


def test_fft_pallas_four_step_matches_dft():
    """The Pallas four-step kernel (C12: the TPU-native 'radix' FFT) and
    its XLA twin cross-validate against the O(N^2) DFT — the reference's
    own FFT test discipline (test/fft_unittest.cpp:53-90), minus its
    '10-2' epsilon typo."""
    from dy4tpu.ops import fft_pallas

    rng = np.random.default_rng(12)
    for n in (64, 512):
        x = (rng.standard_normal((4, n))
             + 1j * rng.standard_normal((4, n))).astype(np.complex64)
        ref = np.asarray(fft.dft(jnp.asarray(x)))
        scale = np.abs(ref).max()
        four = np.asarray(fft_pallas.fft_four_step(jnp.asarray(x)))
        pal = np.asarray(fft_pallas.fft_pallas(jnp.asarray(x),
                                               interpret=True))
        np.testing.assert_allclose(four / scale, ref / scale, atol=1e-5)
        np.testing.assert_allclose(pal / scale, ref / scale, atol=1e-5)


def test_estimate_psd_impls_agree():
    """All three estimate_psd lowerings produce the same Bartlett PSD
    (the auto route picks pallas on TPU, jnp elsewhere)."""
    from unittest import mock

    from dy4tpu.ops import fft_pallas

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    f_j, p_j = fft.estimate_psd(x, nfft=512, fs=48e3, impl="jnp")
    f_4, p_4 = fft.estimate_psd(x, nfft=512, fs=48e3, impl="four_step")
    with mock.patch.object(fft_pallas, "fft_pallas",
                           functools.partial(fft_pallas.fft_pallas,
                                             interpret=True)):
        f_p, p_p = fft.estimate_psd(x, nfft=512, fs=48e3, impl="pallas")
    np.testing.assert_array_equal(f_j, f_4)
    np.testing.assert_allclose(np.asarray(p_4), np.asarray(p_j), atol=1e-3)
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_j), atol=1e-3)
