"""Checkpoint/resume reproduces the exact streaming continuation."""

import numpy as np

import jax.numpy as jnp

from dy4tpu.config import get_mode
from dy4tpu.pipeline import receiver
from dy4tpu.rds.decoder import RDSDecoder
from dy4tpu.tx import fm
from dy4tpu.utils import checkpoint as ckpt


def test_receiver_state_roundtrip(tmp_path):
    cfg = get_mode(0)
    n_blocks = 4
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(440.0, cfg.audio_fs,
                                    n_blocks * cfg.audio_per_block, 0.5))
    params = receiver.make_params(cfg)
    blocks = iq.reshape(n_blocks, cfg.block_size)

    # run 2 blocks, checkpoint, run 2 more
    st = receiver.init_state(cfg)
    for b in range(2):
        st, out = receiver.receiver_step(params, st,
                                         jnp.asarray(blocks[b]), cfg)
    path = str(tmp_path / "rx.ckpt")
    ckpt.save(path, st, host_state={"note": 1}, meta={"block": 2})

    st2, host, meta = ckpt.load(path)
    assert meta["block"] == 2 and host["note"] == 1
    ref, res = [], []
    for b in range(2, 4):
        st, out = receiver.receiver_step(params, st,
                                         jnp.asarray(blocks[b]), cfg)
        ref.append(np.asarray(out.mono))
        st2, out2 = receiver.receiver_step(params, st2,
                                           jnp.asarray(blocks[b]), cfg)
        res.append(np.asarray(out2.mono))
    np.testing.assert_array_equal(np.concatenate(ref), np.concatenate(res))


def test_host_decoder_state_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    sym = rng.integers(0, 2, 500).astype(np.int8)
    d1 = RDSDecoder()
    d1.push_block(sym[:300])
    path = str(tmp_path / "dec.ckpt")
    ckpt.save(path, {}, host_state={"manchester": d1.manchester,
                                    "framer": d1.framer})
    _, host, _ = ckpt.load(path)
    d2 = RDSDecoder()
    d2.manchester, d2.framer = host["manchester"], host["framer"]
    b1 = d1.manchester.push(sym[300:])
    b2 = d2.manchester.push(sym[300:])
    np.testing.assert_array_equal(b1, b2)


def test_iqcorr_state_roundtrip(tmp_path):
    """The IQ tracker's EMA moments ride the same checkpoint pytree:
    a resumed impaired-tuner stream continues bit-identically (no
    re-warm-up of the correction)."""
    cfg = get_mode(0)
    n_blocks = 6
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(440.0, cfg.audio_fs,
                                    n_blocks * cfg.audio_per_block, 0.5),
                       dc_i=0.1, dc_q=-0.05, iq_gain=0.75,
                       iq_phase_deg=15.0)
    params = receiver.make_params(cfg)
    blocks = iq.reshape(n_blocks, cfg.block_size)

    st = receiver.init_state(cfg, with_iqcorr=True)
    for b in range(3):
        st, _ = receiver.receiver_step(params, st,
                                       jnp.asarray(blocks[b]), cfg)
    path = str(tmp_path / "rx_iqcorr.ckpt")
    ckpt.save(path, st, meta={"block": 3})
    st2, _, _ = ckpt.load(path)
    assert int(st2.iqcorr.count) == 3

    for b in range(3, n_blocks):
        st, out = receiver.receiver_step(params, st,
                                         jnp.asarray(blocks[b]), cfg)
        st2, out2 = receiver.receiver_step(params, st2,
                                           jnp.asarray(blocks[b]), cfg)
        np.testing.assert_array_equal(np.asarray(out.mono),
                                      np.asarray(out2.mono))
        np.testing.assert_array_equal(np.asarray(out.left),
                                      np.asarray(out2.left))
