"""End-to-end mono + stereo decode of a synthesised FM broadcast.

The reference validates against off-air captures by ear and PSD plots
(3dy4-project-2024.pdf p.5); here the transmitter is part of the framework
so the check is quantitative: distinct L/R tones must reappear in the
correct output channels with good SNR and channel separation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dy4tpu.config import get_mode
from dy4tpu.pipeline import receiver
from dy4tpu.tx import fm


def _tone_power(x, freq, fs):
    """Power of x at freq via Goertzel-style correlation."""
    t = np.arange(len(x)) / fs
    c = x @ np.exp(-2j * np.pi * freq * t)
    return 2 * np.abs(c) ** 2 / len(x) ** 2


def _run(cfg, iq, n_blocks):
    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg)
    blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))
    state, outs = jax.jit(
        lambda s, b: receiver.run_blocks(params, s, b, cfg))(state, blocks)
    return outs


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_stereo_tones_separate(mode):
    cfg = get_mode(mode)
    n_blocks = 8
    n_audio = n_blocks * cfg.audio_per_block
    lf, rf = 800.0, 2400.0
    left = fm.tone(lf, cfg.audio_fs, n_audio, amp=0.8)
    right = fm.tone(rf, cfg.audio_fs, n_audio, amp=0.8)
    iq = fm.synthesize(cfg, n_blocks, left=left, right=right)

    outs = _run(cfg, iq, n_blocks)
    # skip first blocks (filter warm-up + PLL lock)
    l = np.asarray(outs.left)[3:].ravel()
    r = np.asarray(outs.right)[3:].ravel()

    l_want = _tone_power(l, lf, cfg.audio_fs)
    l_leak = _tone_power(l, rf, cfg.audio_fs)
    r_want = _tone_power(r, rf, cfg.audio_fs)
    r_leak = _tone_power(r, lf, cfg.audio_fs)
    # channel separation > 15 dB
    assert l_want > 30 * l_leak, (l_want, l_leak)
    assert r_want > 30 * r_leak, (r_want, r_leak)


def test_mono_tone_mode0():
    cfg = get_mode(0)
    n_blocks = 6
    n_audio = n_blocks * cfg.audio_per_block
    tone_f = 1000.0
    audio = fm.tone(tone_f, cfg.audio_fs, n_audio, amp=0.9)
    iq = fm.synthesize(cfg, n_blocks, left=audio, right=audio)

    outs = _run(cfg, iq, n_blocks)
    mono = np.asarray(outs.mono)[2:].ravel()
    p_sig = _tone_power(mono, tone_f, cfg.audio_fs)
    p_tot = np.mean((mono - mono.mean()) ** 2)
    # most of the mono power is the tone
    assert p_sig > 0.5 * p_tot
    assert p_sig > 1e-4  # non-degenerate level


def test_block_size_invariance_mono():
    """Streaming property: carried state makes output independent of how
    the stream is cut into blocks (the reference's core refactor bar,
    spec p.5)."""
    cfg = get_mode(0)
    n_blocks = 4
    n_audio = n_blocks * cfg.audio_per_block
    audio = fm.tone(440.0, cfg.audio_fs, n_audio, amp=0.5)
    iq = fm.synthesize(cfg, n_blocks, left=audio, right=audio)

    params = receiver.make_params(cfg)

    # path 1: n_blocks blocks via scan
    st = receiver.init_state(cfg)
    _, outs = receiver.run_blocks(
        params, st, jnp.asarray(iq.reshape(n_blocks, cfg.block_size)), cfg)
    a1 = np.asarray(outs.mono).ravel()

    # path 2: one step at a time
    st = receiver.init_state(cfg)
    chunks = []
    for b in range(n_blocks):
        st, out = receiver.receiver_step(
            params, st,
            jnp.asarray(iq[b * cfg.block_size:(b + 1) * cfg.block_size]), cfg)
        chunks.append(np.asarray(out.mono))
    a2 = np.concatenate(chunks)

    np.testing.assert_allclose(a1, a2, atol=1e-5)
