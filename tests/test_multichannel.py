"""Channel isolation: a batched receiver decoding DIFFERENT stations.

The framework's primary scaling axis is many independent IQ channels
(SURVEY §2.3 X3).  Feed three different synthesized stations — different
audio tones, PI codes and PS names — through ONE batched receiver and
check each channel's RDS decodes to its own station with no cross-talk.
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

STATIONS = [
    dict(pi=0x1111, ps="ALPHA FM", tone=600.0),
    dict(pi=0x2222, ps="BRAVO FM", tone=1000.0),
    dict(pi=0x3333, ps="CHARLIE!", tone=1500.0),
]


@pytest.mark.slow
def test_three_stations_decode_independently():
    cfg = get_mode(0)
    n_blocks = 20
    n_audio = n_blocks * cfg.audio_per_block

    streams = []
    for s in STATIONS:
        audio = fm.tone(s["tone"], cfg.audio_fs, n_audio, amp=0.6)
        bits = coding.make_ps_bitstream(s["pi"], 10, s["ps"], repeats=50)
        streams.append(fm.synthesize(cfg, n_blocks, left=audio, right=audio,
                                     rds_bits=bits))
    iq = np.stack(streams)                       # [3, n_blocks*block]

    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg, batch=(3,))
    blocks = jnp.asarray(iq.reshape(3, n_blocks, cfg.block_size)
                         .transpose(1, 0, 2))   # [n_blocks, 3, block]
    _, outs = jax.jit(
        lambda s, b: receiver.run_blocks(params, s, b, cfg))(state, blocks)

    symbols = np.asarray(outs.rds_symbols)       # [n_blocks, 3, spb]
    resync = np.asarray(outs.rds_resync)         # [n_blocks, 3]

    for c, s in enumerate(STATIONS):
        app = ApplicationLayer()
        dec = RDSDecoder(on_group=app.process)
        for b in range(n_blocks):
            dec.push_block(symbols[b, c], resync=bool(resync[b, c]))
        assert app.info.pi == s["pi"], (c, app.info.pi_hex)
        assert app.info.ps_name == s["ps"], (c, app.info.ps_name)

        # audio isolation: this channel's tone, not the neighbours'
        mono = np.asarray(outs.mono)[3:, c].ravel()
        t = np.arange(len(mono)) / cfg.audio_fs
        own = np.abs(mono @ np.exp(-2j * np.pi * s["tone"] * t))
        for other in STATIONS:
            if other["tone"] == s["tone"]:
                continue
            leak = np.abs(mono @ np.exp(-2j * np.pi * other["tone"] * t))
            assert own > 10 * leak, (c, own, leak)
