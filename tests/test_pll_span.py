"""Span (decimated-feedback) PLL: the opt-in throughput mode.

``pll.pll(span=K)`` updates the loop filter once per K samples and
reconstructs the within-span phases vectorized (ops/pll.py
``_make_span_step``/``_span_expand``) — the receiver's only per-sample
sequential chain shrinks K-fold.  NOT bit-exact vs the reference loop
(src/filter.cpp:174-228), so these tests pin the *quality* contract:
lock on both receiver loop configurations, streaming continuity, scan vs
Pallas-kernel bit-identity, and end-to-end stereo separation + RDS
decode with ``DY4TPU_PLL_SPAN=8``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dy4tpu.config import get_mode
from dy4tpu.ops import pll
from dy4tpu.pipeline import receiver
from dy4tpu.tx import fm

RNG = np.random.default_rng(11)
SPAN = 8


def test_span_locks_pilot():
    # pilot at 19 kHz with phase offset + noise; NCO x2 -> 38 kHz
    fs = 240e3
    n = 16384
    t = np.arange(n) / fs
    x = (np.cos(2 * np.pi * 19e3 * t + 1.1)
         + 0.05 * RNG.normal(size=n)).astype(np.float32)
    st = pll.init_state()
    nco, _, st = pll.pll(jnp.asarray(x), st, freq=19e3, fs=fs,
                         nco_scale=2.0, span=SPAN)
    tail = np.asarray(nco)[-4096:]
    want = np.cos(2 * np.pi * 38e3 * t + 2.2)[-4096:]
    err = np.mean(np.abs(tail - want))
    assert err < 0.08, err


def test_span_locks_rds_carrier():
    # the RDS loop configuration: 114 kHz, nco_scale 0.5, bw 0.001
    # (fmMonoBlock.py:683).  114 kHz at fs/SPAN = 30 kS/s detector rate is
    # far past Nyquist of the carrier — the sampled phase detector must
    # still pull in (the error, not the carrier, is what the loop sees).
    fs = 240e3
    n = 1 << 17
    t = np.arange(n) / fs
    x = np.cos(2 * np.pi * 114e3 * t + 0.9).astype(np.float32)
    st = pll.init_state()
    nco, nco_q, st = pll.pll(jnp.asarray(x), st, freq=114e3, fs=fs,
                             nco_scale=0.5, norm_bandwidth=0.001, span=SPAN)
    tail = np.asarray(nco)[-8192:]
    want = np.cos(2 * np.pi * 57e3 * t + 0.45)[-8192:]
    err = np.mean(np.abs(tail - want))
    assert err < 0.08, err


def test_span_streaming_continuity():
    # two chained blocks == one double-length block, bit-equal
    fs = 240e3
    n = 8192
    t = np.arange(n) / fs
    x = (np.cos(2 * np.pi * 19e3 * t + 0.4)
         + 0.1 * RNG.normal(size=n)).astype(np.float32)
    x[100] = 0.0  # zero-input guard inside a span

    st = pll.init_state()
    full, fullq, _ = pll.pll(jnp.asarray(x), st, freq=19e3, fs=fs,
                             nco_scale=2.0, span=SPAN)
    st = pll.init_state()
    a, aq, st = pll.pll(jnp.asarray(x[:4096]), st, freq=19e3, fs=fs,
                        nco_scale=2.0, span=SPAN)
    b, bq, st = pll.pll(jnp.asarray(x[4096:]), st, freq=19e3, fs=fs,
                        nco_scale=2.0, span=SPAN)
    np.testing.assert_array_equal(np.asarray(full),
                                  np.concatenate([a, b], -1))
    np.testing.assert_array_equal(np.asarray(fullq),
                                  np.concatenate([aq, bq], -1))


@pytest.mark.parametrize("emit", ["xla", "kernel"])
def test_span_pallas_matches_scan(monkeypatch, emit):
    # The Pallas kernel runs the same span-step closure, so the CARRY
    # trajectory is bit-identical and the default (xla-expansion) path
    # reconstructs identical NCO samples.  The kernel-emit A/B variant
    # (DY4TPU_SPAN_EMIT=kernel, measured slower — ops/pll.py) uses the
    # same expansion ops but fma contraction may differ between the two
    # lowerings: emitted samples pinned to <4e-6 (measured 3.8e-6 max),
    # far inside the 5e-3 golden PLL bound.
    monkeypatch.setenv("DY4TPU_SPAN_EMIT", emit)
    fs = 240e3
    n = 4096
    t = np.arange(n) / fs
    x = np.stack([np.cos(2 * np.pi * 19e3 * t + p) for p in
                  (0.0, 0.5, 1.0)]).astype(np.float32)
    x += 0.05 * RNG.normal(size=x.shape).astype(np.float32)

    st = pll.init_state(batch=(3,))
    s_i, s_q, s_st = pll.pll(jnp.asarray(x), st, freq=19e3, fs=fs,
                             nco_scale=2.0, span=SPAN, impl="scan")
    p_i, p_q, p_st = pll.pll(jnp.asarray(x), st, freq=19e3, fs=fs,
                             nco_scale=2.0, span=SPAN, impl="pallas")
    if emit == "xla":
        np.testing.assert_array_equal(np.asarray(s_i), np.asarray(p_i))
        np.testing.assert_array_equal(np.asarray(s_q), np.asarray(p_q))
    else:
        np.testing.assert_allclose(np.asarray(s_i), np.asarray(p_i),
                                   atol=4e-6)
        np.testing.assert_allclose(np.asarray(s_q), np.asarray(p_q),
                                   atol=4e-6)
    for a, b in zip(s_st, p_st):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_span_invalid_length():
    st = pll.init_state()
    with pytest.raises(ValueError):
        pll.pll(jnp.zeros(100, jnp.float32), st, freq=19e3, fs=240e3,
                span=SPAN)


def _tone_power(x, freq, fs):
    t = np.arange(len(x)) / fs
    c = x @ np.exp(-2j * np.pi * freq * t)
    return 2 * np.abs(c) ** 2 / len(x) ** 2


def test_span_receiver_e2e(monkeypatch):
    """Full receiver with DY4TPU_PLL_SPAN=8: stereo separation must stay
    >15 dB and the RDS chain must still decode PI/PS correctly."""
    monkeypatch.setenv("DY4TPU_PLL_SPAN", str(SPAN))
    from dy4tpu.rds import coding
    from dy4tpu.rds.app import ApplicationLayer
    from dy4tpu.rds.decoder import RDSDecoder

    cfg = get_mode(0)
    assert cfg.if_per_block % SPAN == 0
    n_blocks = 28
    n_audio = n_blocks * cfg.audio_per_block
    lf, rf = 800.0, 2400.0
    left = fm.tone(lf, cfg.audio_fs, n_audio, amp=0.7)
    right = fm.tone(rf, cfg.audio_fs, n_audio, amp=0.7)
    pi_code, pty, ps = 0x54A7, 10, "SPANPLL "
    bits = coding.make_ps_bitstream(pi_code, pty, ps, repeats=40)
    iq = fm.synthesize(cfg, n_blocks, left=left, right=right, rds_bits=bits)

    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg)
    blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))
    state, outs = jax.jit(
        lambda s, b: receiver.run_blocks(params, s, b, cfg))(state, blocks)

    l = np.asarray(outs.left)[3:].ravel()
    r = np.asarray(outs.right)[3:].ravel()
    assert _tone_power(l, lf, cfg.audio_fs) > 30 * _tone_power(
        l, rf, cfg.audio_fs)
    assert _tone_power(r, rf, cfg.audio_fs) > 30 * _tone_power(
        r, lf, cfg.audio_fs)

    dec = RDSDecoder()
    app = ApplicationLayer()
    symbols = np.asarray(outs.rds_symbols)
    resync = np.asarray(outs.rds_resync)
    for k in range(n_blocks):
        for g in dec.push_block(symbols[k], bool(resync[k])):
            app.process(g)
    assert app.info.pi == pi_code
    assert app.info.ps_name == ps
