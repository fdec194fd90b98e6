import numpy as np
import pytest

import jax.numpy as jnp
from scipy import signal as sp_signal

from dy4tpu.ops import fir, firdes
import naive


RNG = np.random.default_rng(3)


def test_lpf_matches_reference_convention():
    # reference design: sinc * sin^2 Hann * upFactor (src/filter.cpp:14-29)
    h = firdes.lpf(240e3, 16e3, 101, up_factor=1)
    assert h.shape == (101,)
    # centre tap equals the normalised cutoff times its window value
    win50 = np.sin(50 * np.pi / 101) ** 2
    assert np.isclose(h[50], 16e3 / 120e3 * win50, atol=1e-6)
    # window zeroes the first tap (reference convention)
    assert h[0] == 0.0
    # DC gain ~1
    assert np.isclose(h.sum(), 1.0, atol=0.02)
    # polyphase-scaled variant: DC gain ~ up_factor (within the design's
    # inherent droop for narrow cutoffs)
    h19 = firdes.lpf(240e3 * 19, 3e3, 101 * 19, up_factor=19)
    assert np.isclose(h19.sum(), 19.0, rtol=0.1)


def test_bpf_rejects_out_of_band():
    h = firdes.bpf(240e3, 18.5e3, 19.5e3, 101)
    w, resp = sp_signal.freqz(h, fs=240e3, worN=4096)
    mag = np.abs(resp)
    inband = mag[(w > 18.7e3) & (w < 19.3e3)].min()
    outband = mag[(w < 10e3) | (w > 30e3)].max()
    assert inband > 10 * outband


def test_rrc_matches_closed_form_samples():
    h = firdes.rrc(38000.0, 101)
    assert h.shape == (101,)
    # centre tap (t=0 at k=floor(N/2)? reference uses k-N/2, so t=0 at k=50.5
    # never hit for odd N... for N_taps=101 t=0 is not sampled; peak near mid)
    assert h[np.abs(h).argmax()] == h.max()
    # symmetric about N/2
    assert np.allclose(h[1:], h[:0:-1], atol=1e-5)


@pytest.mark.parametrize("n,k", [(64, 11), (256, 101)])
def test_block_fir_matches_naive_and_statefulness(n, k):
    h = RNG.normal(size=k).astype(np.float32)
    x = RNG.normal(size=2 * n).astype(np.float32)
    state = np.zeros(k - 1, np.float32)

    # two blocks through the jax op
    s = jnp.asarray(state)
    y1, s = fir.block_fir(jnp.asarray(x[:n]), jnp.asarray(h), s)
    y2, s = fir.block_fir(jnp.asarray(x[n:]), jnp.asarray(h), s)

    ref1, st = naive.block_fir(x[:n], h, state)
    ref2, _ = naive.block_fir(x[n:], h, st)
    np.testing.assert_allclose(np.asarray(y1), ref1, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y2), ref2, atol=2e-4)

    # block processing == single pass over the concatenated stream
    full = sp_signal.lfilter(h, 1.0, x)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)]), full, atol=2e-4)


@pytest.mark.parametrize("decim", [5, 10])
def test_block_fir_decim(decim):
    h = RNG.normal(size=101).astype(np.float32)
    x = RNG.normal(size=1000).astype(np.float32)
    state = np.zeros(100, np.float32)
    y, _ = fir.block_fir_decim(jnp.asarray(x), jnp.asarray(h),
                               jnp.asarray(state), decim)
    full = sp_signal.lfilter(h, 1.0, x)[::decim]
    np.testing.assert_allclose(np.asarray(y), full, atol=2e-4)


@pytest.mark.parametrize("up,down,k", [(1, 5, 101), (19, 120, 101 * 19),
                                       (147, 800, 101 * 147)])
def test_block_fir_resample_matches_naive(up, down, k):
    h = RNG.normal(size=k).astype(np.float32) / np.sqrt(k)
    s_len0 = fir.state_len(k, up)
    # block must be divisible by down/gcd(up,down) and >= carried state
    unit = down // np.gcd(down, up)
    n = int(np.ceil(max(2 * s_len0, 2 * down) / unit)) * unit
    x = RNG.normal(size=2 * n).astype(np.float32)
    s_len = fir.state_len(k, up)
    state = np.zeros(s_len, np.float32)

    s = jnp.asarray(state)
    y1, s = fir.block_fir_resample(jnp.asarray(x[:n]), jnp.asarray(h), s,
                                   up=up, down=down)
    y2, s = fir.block_fir_resample(jnp.asarray(x[n:]), jnp.asarray(h), s,
                                   up=up, down=down)

    ref1, st = naive.block_fir_resample(x[:n], h, state, up, down)
    ref2, _ = naive.block_fir_resample(x[n:], h, st, up, down)
    np.testing.assert_allclose(np.asarray(y1), ref1, atol=3e-4)
    np.testing.assert_allclose(np.asarray(y2), ref2, atol=3e-4)


def test_block_fir_batched():
    h = RNG.normal(size=31).astype(np.float32)
    x = RNG.normal(size=(3, 4, 120)).astype(np.float32)
    state = RNG.normal(size=(3, 4, 30)).astype(np.float32)
    y, ns = fir.block_fir(jnp.asarray(x), jnp.asarray(h), jnp.asarray(state))
    assert y.shape == (3, 4, 120) and ns.shape == (3, 4, 30)
    ref, ref_state = naive.block_fir(x[1, 2], h, state[1, 2])
    np.testing.assert_allclose(np.asarray(y[1, 2]), ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ns[1, 2]), ref_state, atol=0)


def test_filter_bank_matches_individual():
    hs = RNG.normal(size=(4, 101)).astype(np.float32)
    x = RNG.normal(size=(2, 500)).astype(np.float32)
    states = RNG.normal(size=(2, 4, 100)).astype(np.float32)
    y, ns = fir.block_fir_bank(jnp.asarray(x), jnp.asarray(hs),
                               jnp.asarray(states))
    assert y.shape == (2, 4, 500)
    for f in range(4):
        yf, sf = fir.block_fir(jnp.asarray(x), jnp.asarray(hs[f]),
                               jnp.asarray(states[:, f]))
        np.testing.assert_allclose(np.asarray(y[:, f]), np.asarray(yf),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(ns[:, f]), np.asarray(sf))


def test_up_down_sample():
    x = jnp.arange(12.0)
    up = fir.upsample(x, 3)
    assert up.shape == (36,)
    assert np.allclose(np.asarray(up[::3]), np.asarray(x))
    assert float(jnp.abs(up).sum()) == float(jnp.abs(x).sum())
    dn = fir.downsample(up, 3)
    np.testing.assert_allclose(np.asarray(dn), np.asarray(x))


def test_convolve_full():
    h = RNG.normal(size=7).astype(np.float32)
    x = RNG.normal(size=20).astype(np.float32)
    y = fir.convolve_full(jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(y), np.convolve(x, h), atol=1e-5)
