"""Beyond-parity Kaiser audio resampler vs the reference Hann design.

The reference's audio LPF (src/filter.cpp:14-29 with gain x U,
project.cpp:184-222 polyphase convention) uses a Hann (sin^2) window,
whose stopband floors at ~44 dB.  ``firdes.lpf_kaiser`` keeps the exact
geometry (tap count, x U gain, same ``block_fir_resample`` call) and
swaps the window for a Kaiser sized at 80 dB.  Opt-in via
``make_params(..., audio_filter="kaiser")`` / CLI ``--audio-filter``;
documented in PARITY.md "Deliberate deviations".
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dy4tpu.config import get_mode
from dy4tpu.ops import fir, firdes
from dy4tpu.pipeline import receiver


def _response_db(h, n_fft=1 << 18):
    H = np.fft.rfft(np.asarray(h, np.float64), n_fft)
    return 20.0 * np.log10(np.maximum(np.abs(H), 1e-12))


@pytest.mark.parametrize("mode", [2, 3])  # the taps*147 resampler modes
def test_kaiser_stopband_beats_reference(mode):
    cfg = get_mode(mode)
    fs = cfg.if_fs * cfg.audio_up
    h_ref = firdes.lpf(fs, cfg.audio_fc, cfg.audio_taps,
                       up_factor=cfg.audio_up)
    h_k = firdes.lpf_kaiser(fs, cfg.audio_fc, cfg.audio_taps,
                            up_factor=cfg.audio_up)
    assert h_k.shape == h_ref.shape  # drop-in geometry

    n_fft = 1 << 18
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / fs)
    db_ref = _response_db(h_ref, n_fft)
    db_k = _response_db(h_k, n_fft)
    # normalise to each filter's DC level (both carry the x U gain)
    db_ref -= db_ref[0]
    db_k -= db_k[0]

    # the band that matters: content above audio_fs - fc folds INTO the
    # audible passband after decimation
    fold = freqs > (cfg.audio_fs - cfg.audio_fc)
    worst_ref = db_ref[fold].max()
    worst_k = db_k[fold].max()
    assert worst_k < worst_ref - 15.0, (worst_ref, worst_k)
    assert worst_k < -85.0, worst_k

    # passband cost bounded: no more than 1 dB extra droop anywhere in
    # the band vs the reference design
    pb = freqs < cfg.audio_fc
    assert (db_ref[pb] - db_k[pb]).max() < 1.0, \
        (db_ref[pb] - db_k[pb]).max()


def test_kaiser_alias_rejection_end_to_end():
    """Two-tone resample through the production polyphase call: the tone
    above the output Nyquist must fold back ~30 dB quieter with the
    Kaiser design; the passband tone must keep its level."""
    cfg = get_mode(2)  # 240 kHz IF -> 44.1 kHz audio, U/D = 147/800
    n_blocks = 6
    n_in = n_blocks * cfg.if_per_block
    t = np.arange(n_in) / cfg.if_fs
    f_pass, f_alias = 5000.0, 40000.0  # 40 kHz > 22.05 kHz Nyquist
    x = (np.sin(2 * np.pi * f_pass * t)
         + np.sin(2 * np.pi * f_alias * t)).astype(np.float32)

    outs = {}
    for name in ("reference", "kaiser"):
        params = receiver.make_params(cfg, audio_filter=name)
        tail = jnp.zeros(fir.state_len(cfg.audio_taps, cfg.audio_up))
        y, _ = fir.block_fir_resample(jnp.asarray(x), params.audio_coeff,
                                      tail, up=cfg.audio_up,
                                      down=cfg.audio_down)
        outs[name] = np.asarray(y, np.float64)

    fs_out = cfg.audio_fs
    for name, y in outs.items():
        y = y[len(y) // 3:]  # drop transient
        # Kaiser(beta=24) analysis window: sidelobes far below the alias
        # levels being measured (hanning's -31 dB leakage would floor it)
        Y = np.abs(np.fft.rfft(y * np.kaiser(len(y), 24.0)))
        freqs = np.fft.rfftfreq(len(y), d=1.0 / fs_out)
        pass_pow = Y[np.argmin(np.abs(freqs - f_pass))]
        # the 40 kHz tone folds to 44.1 - 40 = 4.1 kHz
        alias_pow = Y[np.argmin(np.abs(freqs - (fs_out - f_alias)))]
        outs[name] = 20 * np.log10(alias_pow / pass_pow)

    assert outs["kaiser"] < outs["reference"] - 15.0, outs
    assert outs["kaiser"] < -80.0, outs


def test_kaiser_params_run_the_full_receiver():
    """audio_filter="kaiser" threads through receiver_step unchanged
    (same shapes/geometry); one block runs and produces finite audio."""
    cfg = get_mode(0)
    params = receiver.make_params(cfg, audio_filter="kaiser")
    state = receiver.init_state(cfg)
    rng = np.random.default_rng(0)
    blk = jnp.asarray(rng.integers(0, 256, cfg.block_size, dtype=np.uint8))
    _, out = receiver.receiver_step(params, state, blk, cfg)
    assert np.isfinite(np.asarray(out.left)).all()
