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
