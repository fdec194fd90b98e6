"""Failure detection & recovery (SURVEY §5).

The reference's protocol-level recovery — CDR amplitude-threshold resync
(fmSupportLib.py:235-238) and frame-sync loss detection + re-acquisition
(fmMonoBlock.py:199-283) — exercised end-to-end: the RDS subcarrier
drops out mid-stream and the receiver must re-lock and decode again.

Plus the numerical-robustness improvement over the reference: PLL phase
accumulators are wrapped mod 4*pi, so lock quality does not decay on
unbounded streams (the reference's float accumulators grow forever,
filter.cpp:213-214).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dy4tpu.config import get_mode
from dy4tpu.ops import pll
from dy4tpu.pipeline import receiver
from dy4tpu.rds import coding
from dy4tpu.rds.app import ApplicationLayer
from dy4tpu.rds.decoder import RDSDecoder
from dy4tpu.tx import fm


@pytest.mark.slow
def test_rds_dropout_and_reacquisition():
    cfg = get_mode(0)
    seg = 14  # blocks per segment: signal / dropout / signal
    bits = coding.make_ps_bitstream(0xD00D, 7, "RECOVERY", repeats=80)

    def synth(with_rds, n_blocks, seed):
        n_audio = n_blocks * cfg.audio_per_block
        return fm.synthesize(
            cfg, n_blocks,
            left=fm.tone(700.0, cfg.audio_fs, n_audio, 0.6),
            right=fm.tone(1900.0, cfg.audio_fs, n_audio, 0.6),
            rds_bits=bits if with_rds else None, seed=seed)

    iq = np.concatenate([synth(True, seg, 0), synth(False, 4, 1),
                         synth(True, seg, 2)])
    n_blocks = len(iq) // cfg.block_size

    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg)
    blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))
    _, outs = jax.jit(
        lambda s, b: receiver.run_blocks(params, s, b, cfg))(state, blocks)

    symbols = np.asarray(outs.rds_symbols)
    resync = np.asarray(outs.rds_resync)

    app = ApplicationLayer()
    dec = RDSDecoder(on_group=app.process)
    group_blocks = []
    for b in range(n_blocks):
        got = dec.push_block(symbols[b], resync=bool(resync[b]))
        group_blocks.extend([b] * len(got))

    # groups decoded before the dropout AND re-acquired after it
    assert any(b < seg for b in group_blocks), group_blocks
    assert any(b >= seg + 4 + 4 for b in group_blocks), group_blocks
    assert app.info.pi == 0xD00D
    # the dropout must actually have tripped the CDR resync at least once
    assert resync[seg:seg + 4 + 2].any()


@pytest.mark.slow
def test_pll_long_stream_phase_stability():
    """After ~1.5M samples the NCO still tracks cos(2*(w t + phi)) — the
    wrapped accumulators do not lose precision (reference deviation,
    ops/pll.py module docstring)."""
    fs = 240e3
    n_block = 7680
    n_blocks = 200
    phi = 0.77
    st = pll.init_state()
    k0 = 0
    err_last = None
    for b in range(n_blocks):
        t = (k0 + np.arange(n_block)) / fs
        x = np.cos(2 * np.pi * 19e3 * t + phi).astype(np.float32)
        nco, _, st = pll.pll(jnp.asarray(x), st, freq=19e3, fs=fs,
                             nco_scale=2.0)
        k0 += n_block
    want = np.cos(2 * (2 * np.pi * 19e3 * t + phi))
    err_last = float(np.mean(np.abs(np.asarray(nco)[64:] - want[64:])))
    assert err_last < 0.05, err_last
