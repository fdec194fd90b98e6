"""Square-law (envelope) RDS symbol-timing acquisition (receiver._cdr
``timing="envelope"``, CLI ``--cdr envelope`` / ``DY4TPU_CDR``).

The reference's CDR trusts the strongest |I| sample of the FIRST TWO
SYMBOLS (fmSupportLib.py:209-247) — at mode 2's SPS=27 that evidence
is thin enough to mislock even on a CLEAN capture (measured below).
The opt-in estimator uses the Oerder-Meyr square-law line instead:
``arg(sum e[n] exp(-j 2pi n/sps))`` over the whole block — one dot,
no scan, every sample votes.
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


def test_envelope_estimator_unit():
    """A pulse train peaked at n = k (mod sps) must yield offset k."""
    sps, m = 16, 64
    n = np.arange(m * sps)
    for k in (0, 3, 11, 15):
        rng = np.random.default_rng(k)
        signs = np.repeat(rng.choice([-1.0, 1.0], m + 1), sps)[: len(n)]
        bump = np.maximum(np.cos(2 * np.pi * (n - k) / sps), 0.0) ** 2
        bb_i = jnp.asarray(signs * bump, jnp.float32)
        state = receiver.CDRState(offset=jnp.zeros((), jnp.int32),
                                  found=jnp.zeros((), bool))
        _, _, _, _, new = receiver._cdr(bb_i, jnp.zeros_like(bb_i),
                                        state, sps, timing="envelope")
        assert int(new.offset) == k, (k, int(new.offset))


def _decode(mode, timing, n_blocks=16, noise=0.0, seed=0):
    cfg = get_mode(mode)
    n_audio = n_blocks * cfg.audio_per_block
    bits = coding.make_ps_bitstream(0x54A7, 9, "ENVELOPE", repeats=60)
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(800.0, cfg.audio_fs, n_audio, 0.6),
                       right=fm.tone(2400.0, cfg.audio_fs, n_audio, 0.6),
                       rds_bits=bits, noise=noise, seed=seed)
    params = receiver.make_params(cfg)
    st = receiver.init_state(cfg)
    blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))

    def body(s, b):
        return receiver.receiver_step(params, s, b, cfg,
                                      cdr_timing=timing)

    _, outs = jax.jit(lambda s, b: jax.lax.scan(body, s, b))(st, blocks)
    app = ApplicationLayer()
    dec = RDSDecoder(on_group=app.process)
    sym = np.asarray(outs.rds_symbols)
    rs = np.asarray(outs.rds_resync)
    for b in range(n_blocks):
        dec.push_block(sym[b], resync=bool(rs[b]))
    return app.info


def test_envelope_equivalent_mode0():
    """At SPS=16 both estimators lock a clean capture."""
    peak = _decode(0, "peak")
    env = _decode(0, "envelope")
    assert peak.pi == env.pi == 0x54A7
    assert env.groups_seen >= peak.groups_seen >= 3


def test_envelope_rescues_mode2():
    """Mode 2 (SPS=27), CLEAN capture: the reference's two-symbol peak
    search picks a suboptimal phase (measured: 1 group, no PS), the
    whole-block envelope estimate decodes the stream properly.  This
    pins the quantitative gap behind the reference's own 'RDS lost
    sync and never re-locked' observation (Final Report p.7)."""
    peak = _decode(2, "peak")
    env = _decode(2, "envelope")
    assert env.pi == 0x54A7
    assert env.ps_name == "ENVELOPE"
    assert env.groups_seen >= peak.groups_seen + 3, (
        env.groups_seen, peak.groups_seen)


def test_envelope_under_noise_mode0():
    """With channel noise the whole-block estimate must keep decoding
    at least as well as the two-symbol peak."""
    peak = _decode(0, "peak", n_blocks=20, noise=0.4, seed=7)
    env = _decode(0, "envelope", n_blocks=20, noise=0.4, seed=7)
    assert env.pi == 0x54A7
    assert env.groups_seen >= max(1, peak.groups_seen)


def test_unknown_timing_rejected():
    cfg = get_mode(0)
    params = receiver.make_params(cfg)
    st = receiver.init_state(cfg)
    with pytest.raises(ValueError, match="cdr_timing"):
        receiver.receiver_step(params, st,
                               jnp.zeros((cfg.block_size,), jnp.uint8),
                               cfg, cdr_timing="gardner")
