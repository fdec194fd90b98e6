"""Decode robustness under channel noise.

The reference was validated by ear on off-air captures; here the TX
noise knob gives a quantitative sensitivity floor: the full RDS chain
must still produce correct groups with additive IQ noise, and the
stereo decoder must keep separating channels.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dy4tpu.config import get_mode
from dy4tpu.pipeline import receiver
from dy4tpu.rds import coding
from dy4tpu.rds.app import ApplicationLayer
from dy4tpu.rds.decoder import RDSDecoder
from dy4tpu.tx import fm


@pytest.mark.slow
def test_rds_decodes_through_noise():
    cfg = get_mode(0)
    n_blocks = 20
    n_audio = n_blocks * cfg.audio_per_block
    bits = coding.make_ps_bitstream(0x5A5A, 9, "NOISY OK", repeats=60)
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(800.0, cfg.audio_fs, n_audio, 0.6),
                       right=fm.tone(2400.0, cfg.audio_fs, n_audio, 0.6),
                       rds_bits=bits, noise=0.05, seed=3)

    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg)
    blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))
    _, outs = jax.jit(
        lambda s, b: receiver.run_blocks(params, s, b, cfg))(state, blocks)

    app = ApplicationLayer()
    dec = RDSDecoder(on_group=app.process)
    symbols = np.asarray(outs.rds_symbols)
    resync = np.asarray(outs.rds_resync)
    for b in range(n_blocks):
        dec.push_block(symbols[b], resync=bool(resync[b]))

    assert app.info.pi == 0x5A5A
    assert app.info.groups_seen >= 3

    # stereo separation survives (>=10 dB post-lock)
    left = np.asarray(outs.left)[4:].ravel()
    t = np.arange(len(left)) / cfg.audio_fs
    want = np.abs(left @ np.exp(-2j * np.pi * 800.0 * t))
    leak = np.abs(left @ np.exp(-2j * np.pi * 2400.0 * t))
    assert want > 10 * leak, (want, leak)


@pytest.mark.slow
def test_decode_through_multipath():
    """Static multipath (tx/fm.py ``multipath=``): FM's constant-modulus
    demod rides through an urban two-echo profile (-6 dB @ 10 us,
    -10 dB @ 25 us at 2.4 MS/s) — stereo separation stays >= 15 dB and
    the RDS group stream keeps its PI.  The reference validates urban
    reception only by ear; this pins the margin quantitatively."""
    cfg = get_mode(0)
    n_blocks = 14
    n_audio = n_blocks * cfg.audio_per_block
    bits = coding.make_ps_bitstream(0x54A7, 9, "ECHO  OK", repeats=60)
    iq = fm.synthesize(
        cfg, n_blocks,
        left=fm.tone(800.0, cfg.audio_fs, n_audio, 0.6),
        right=fm.tone(2400.0, cfg.audio_fs, n_audio, 0.6),
        rds_bits=bits,
        multipath=[(24, 0.5 * np.exp(1j * 2.1)),
                   (60, 0.32 * np.exp(-1j * 0.9))])

    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg)
    blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))
    _, outs = jax.jit(
        lambda s, b: receiver.run_blocks(params, s, b, cfg))(state, blocks)

    app = ApplicationLayer()
    dec = RDSDecoder(on_group=app.process)
    symbols = np.asarray(outs.rds_symbols)
    resync = np.asarray(outs.rds_resync)
    for b in range(n_blocks):
        dec.push_block(symbols[b], resync=bool(resync[b]))
    assert app.info.pi == 0x54A7
    assert app.info.groups_seen >= 2

    def tone_power(x, freq):
        t = np.arange(len(x)) / cfg.audio_fs
        c = x @ np.exp(-2j * np.pi * freq * t)
        return 2 * np.abs(c) ** 2 / len(x) ** 2

    l = np.asarray(outs.left)[4:].ravel()
    r = np.asarray(outs.right)[4:].ravel()
    sep = 10 * np.log10(min(tone_power(l, 800.0) / tone_power(l, 2400.0),
                            tone_power(r, 2400.0) / tone_power(r, 800.0)))
    assert sep > 15.0, sep
