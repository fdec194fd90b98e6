"""Blind DC / IQ-imbalance correction (ops/iqcorr.py).

Beyond-parity subsystem: the reference consumes RTL-SDR captures as-is
(src/iofunc.cpp:113-120), so the bar here is self-consistency (the
estimator must invert the documented impairment model) plus a
quantitative end-to-end recovery: an impaired capture that breaks the
stereo decode must decode again with the tracker enabled, and the
fused front kernel's in-VMEM correction must match the stock path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dy4tpu.config import get_mode
from dy4tpu.ops import frontend_pallas, iqcorr
from dy4tpu.pipeline import receiver
from dy4tpu.tx import fm as txfm

# strong-but-plausible tuner fault: 3.1 dB gain skew, 25 deg quadrature
# error, LO-leakage offsets ~15/10 u8 LSB -> model IRR ~11 dB, enough
# to cost the mode-0 stereo decode >10 dB of separation (measured:
# 30.3 -> 16.6 dB; corrected 30.4).  The Q gain is ATTENUATING (0.7)
# so the impaired capture stays inside the u8 range: ADC saturation
# truncates the ellipse and biases ANY blind estimator (a 1.5x gain
# clipped at 255 fit rho 0.53 vs truth 0.63) — keeping the ADC out of
# saturation is the AGC's job, not the corrector's.
GAIN, PHASE, DCI, DCQ = 0.7, 25.0, 0.12, -0.08


def _impaired_fm_iq(n, seed=0):
    """A unit-modulus FM-like complex stream + its impaired observation."""
    rng = np.random.default_rng(seed)
    # fast-mixing phase walk: the estimator's moment model only needs
    # E[i^2]=E[q^2], E[iq]=0, which a slow walk approaches too slowly
    # for a finite-sample tolerance
    phase = np.cumsum(1.5 * rng.standard_normal(n))
    i, q = np.cos(phase), np.sin(phase)
    io, qo = iqcorr.impair(i, q, dc_i=DCI, dc_q=DCQ, gain=GAIN,
                           phase_deg=PHASE)
    return (i, q), (io, qo)


def test_estimator_inverts_model():
    """Moment estimates converge to the model parameters and the
    Gram-Schmidt correction recovers the clean stream."""
    (i, q), (io, qo) = _impaired_fm_iq(1 << 16)
    st = iqcorr.init_iqcorr_state()
    for blk in np.split(np.arange(1 << 16), 16):
        st = iqcorr.estimate(jnp.asarray(io[blk]), jnp.asarray(qo[blk]), st)
    c = iqcorr.coeffs(st)
    assert abs(float(c.dc_i) - DCI) < 5e-3
    assert abs(float(c.dc_q) - DCQ) < 5e-3
    # rho = Ciq/Cii = g*sin(phi);  s = 1/(g*cos(phi))
    phi = np.deg2rad(PHASE)
    assert abs(float(c.rho) - GAIN * np.sin(phi)) < 2e-2
    assert abs(float(c.s) - 1.0 / (GAIN * np.cos(phi))) < 2e-2

    ic, qc = iqcorr.apply(jnp.asarray(io), jnp.asarray(qo), c)
    err = np.hypot(np.asarray(ic) - i, np.asarray(qc) - q)
    assert np.sqrt(np.mean(err ** 2)) < 0.03


def test_image_rejection_improves():
    """Complex tone at +f: the impairment images it onto -f at the
    model's IRR; correction buys >= 25 dB more rejection."""
    n, fbin = 4096, 300
    t = np.arange(n)
    x = np.exp(2j * np.pi * fbin * t / n)
    io, qo = iqcorr.impair(x.real, x.imag, dc_i=DCI, dc_q=DCQ,
                           gain=GAIN, phase_deg=PHASE)
    st = iqcorr.init_iqcorr_state()
    for blk in np.split(np.arange(n), 8):
        st = iqcorr.estimate(jnp.asarray(io[blk]), jnp.asarray(qo[blk]), st)
    ic, qc = iqcorr.apply(jnp.asarray(io), jnp.asarray(qo),
                          iqcorr.coeffs(st))

    def image_db(i_, q_):
        spec = np.fft.fft(np.asarray(i_) + 1j * np.asarray(q_))
        return 20 * np.log10(np.abs(spec[-fbin]) / np.abs(spec[fbin]))

    before = image_db(io, qo)
    after = image_db(ic, qc)
    # model IRR check (negative of image level): ~16.3 dB at these params
    assert abs(-before - iqcorr.image_rejection_db(GAIN, PHASE)) < 1.0
    assert before - after > 25.0, (before, after)


def test_coeffs_identity_guards():
    """Fresh state and too-weak streams must yield the identity, so
    apply() is unconditionally safe (e.g. squelched channels)."""
    for st in (iqcorr.init_iqcorr_state((3,)),
               iqcorr.estimate(jnp.zeros((3, 64)) + 1e-5,
                               jnp.zeros((3, 64)),
                               iqcorr.init_iqcorr_state((3,)))):
        c = iqcorr.coeffs(st)
        np.testing.assert_allclose(np.asarray(c.dc_i), 0.0)
        np.testing.assert_allclose(np.asarray(c.rho), 0.0)
        np.testing.assert_allclose(np.asarray(c.s), 1.0)
        i = jnp.asarray(np.random.default_rng(0).standard_normal((3, 64)))
        ic, qc = iqcorr.apply(i, i + 1.0, c)
        np.testing.assert_allclose(np.asarray(ic), np.asarray(i))
        np.testing.assert_allclose(np.asarray(qc), np.asarray(i) + 1.0)


def _tone_power(x, freq, fs):
    t = np.arange(len(x)) / fs
    c = x @ np.exp(-2j * np.pi * freq * t)
    return 2 * np.abs(c) ** 2 / len(x) ** 2


def _sep_db(outs, lf, rf, fs):
    l = np.asarray(outs.left)[4:].ravel()
    r = np.asarray(outs.right)[4:].ravel()
    return 10 * np.log10(min(
        _tone_power(l, lf, fs) / max(_tone_power(l, rf, fs), 1e-30),
        _tone_power(r, rf, fs) / max(_tone_power(r, lf, fs), 1e-30)))


def test_e2e_stereo_recovery():
    """Mode 0 stereo through an impaired tuner: the impairment costs
    >= 10 dB of channel separation; enabling the tracker wins most of
    it back (strictly causal — block 0 runs uncorrected)."""
    cfg = get_mode(0)
    n_blocks = 10
    n_audio = n_blocks * cfg.audio_per_block
    lf, rf = 800.0, 2400.0
    kw = dict(left=txfm.tone(lf, cfg.audio_fs, n_audio, amp=0.8),
              right=txfm.tone(rf, cfg.audio_fs, n_audio, amp=0.8))
    clean = txfm.synthesize(cfg, n_blocks, **kw)
    dirty = txfm.synthesize(cfg, n_blocks, dc_i=DCI, dc_q=DCQ,
                            iq_gain=GAIN, iq_phase_deg=PHASE, **kw)
    params = receiver.make_params(cfg)

    def run(iq, with_iqcorr):
        st = receiver.init_state(cfg, with_iqcorr=with_iqcorr)
        blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))
        _, outs = jax.jit(lambda s, b: receiver.run_blocks(
            params, s, b, cfg))(st, blocks)
        return _sep_db(outs, lf, rf, cfg.audio_fs)

    sep_clean = run(clean, False)
    sep_dirty = run(dirty, False)
    sep_fixed = run(dirty, True)
    assert sep_clean - sep_dirty > 10.0, (sep_clean, sep_dirty)
    assert sep_fixed - sep_dirty > 8.0, (sep_fixed, sep_dirty)
    assert sep_fixed > sep_clean - 4.0, (sep_fixed, sep_clean)


def test_fused_full_corr_matches_stock():
    """The fused front kernel's in-VMEM correction epilogue + moment
    tap vs the stock path's iqcorr.apply/moments at the same
    coefficients (interpret mode)."""
    cfg = get_mode(0)
    c = 2
    params = receiver.make_params(cfg)
    n_blocks = 2
    iq = txfm.synthesize(cfg, n_blocks, dc_i=DCI, dc_q=DCQ, iq_gain=GAIN,
                         iq_phase_deg=PHASE,
                         left=txfm.tone(700.0, cfg.audio_fs,
                                        n_blocks * cfg.audio_per_block,
                                        amp=0.7))
    blocks = iq.reshape(n_blocks, cfg.block_size)
    st = receiver.init_state(cfg, batch=(c,), with_iqcorr=True)
    fs = receiver.front_state_of(st)
    # fixed non-trivial coefficients (the model truth, in i_ds units);
    # the parity bar only needs both paths to consume the SAME ones
    phi = np.deg2rad(PHASE)
    mk = lambda v: jnp.full((c,), v, jnp.float32)  # noqa: E731
    corr = iqcorr.IQCorrCoeffs(
        dc_i=mk(DCI * 100 / 128), dc_q=mk(DCQ * 100 / 128),
        rho=mk(GAIN * np.sin(phi)), s=mk(1.0 / (GAIN * np.cos(phi))))
    for it in range(n_blocks):
        blk = (jnp.broadcast_to(jnp.asarray(blocks[it]),
                                (c, cfg.block_size)) + jnp.uint8(0))
        fs_ref, fo_ref, mom_ref = receiver.front_step(
            params, fs, blk, cfg, frontend="stock", corr=corr,
            corr_moments=True)
        corr_arr = jnp.stack([corr.dc_i, corr.dc_q, corr.rho, corr.s],
                             axis=-1)
        r = frontend_pallas.fused_frontend_full(
            blk, params.rf_coeff, params.bank_coeff,
            params.rds_carrier_coeff, fs.rf.iq_tail, fs.rf.prev_i,
            fs.rf.prev_q, fs.bank_tail, fs.mono_delay, fs.carrier_tail,
            fs.rds_delay, cfg.rf_decim, rds=True, mm_dtype=jnp.float32,
            interpret=True, corr=corr_arr)
        (fmd, pilot, stereo, carrier, rdsdel, *_rest) = r
        mom_k = r[-1]
        for a, b, tol in [(fmd, fo_ref.fm_delayed, 2e-3),
                          (pilot, fo_ref.pilot, 1e-4),
                          (stereo, fo_ref.stereo_band, 5e-4),
                          (carrier, fo_ref.carrier, 1e-5),
                          (rdsdel, fo_ref.rds_delayed, 1e-4),
                          (mom_k, mom_ref, 5e-4)]:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=tol)
        fs = fs_ref   # block 1 exercises non-trivial histories


def test_receiver_step_if_iqcorr_runs():
    """IF-entry path with the tracker: state advances, outputs stay
    finite, and the corrected chain still jits under scan."""
    cfg = get_mode(0)
    n = cfg.if_per_block
    rng = np.random.default_rng(3)
    phase = np.cumsum(0.3 * rng.standard_normal(4 * n))
    i, q = iqcorr.impair(np.cos(phase), np.sin(phase),
                         dc_i=0.05, gain=1.1, phase_deg=5.0)
    params = receiver.make_params(cfg)
    st = receiver.init_state(cfg, with_iqcorr=True)

    def body(s, blk):
        return receiver.receiver_step_if(params, s, blk[0], blk[1], cfg)

    blocks = (jnp.asarray(i.reshape(4, n), jnp.float32),
              jnp.asarray(q.reshape(4, n), jnp.float32))
    st2, outs = jax.jit(lambda s, b: jax.lax.scan(body, s, b))(st, blocks)
    assert int(st2.iqcorr.count) == 4
    assert np.isfinite(np.asarray(outs.mono)).all()
    assert float(st2.iqcorr.m[iqcorr._IDX[(2, 0)]]) > 0.0  # E[i^2]


def test_iqcorr_rejected_on_ab_frontends():
    cfg = get_mode(0)
    params = receiver.make_params(cfg)
    st = receiver.init_state(cfg, with_iqcorr=True)
    corr = iqcorr.coeffs(st.iqcorr)
    blk = jnp.zeros((cfg.block_size,), jnp.uint8)
    with pytest.raises(ValueError, match="IQ correction"):
        receiver.front_step(params, receiver.front_state_of(st), blk,
                            cfg, frontend="fused-rf", corr=corr)


def test_clean_capture_bit_identical():
    """Deadband property: on a healthy tuner the sub-noise estimates
    snap to the exact identity, so the tracker-on decode is
    BIT-IDENTICAL to tracker-off (no correction tax on clean signals —
    the -6 dB separation regression this deadband fixed)."""
    cfg = get_mode(0)
    n_blocks = 6
    n_audio = n_blocks * cfg.audio_per_block
    iq = txfm.synthesize(
        cfg, n_blocks,
        left=txfm.tone(800.0, cfg.audio_fs, n_audio, amp=0.8),
        right=txfm.tone(2400.0, cfg.audio_fs, n_audio, amp=0.8))
    params = receiver.make_params(cfg)
    blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))

    def run(with_iqcorr):
        st = receiver.init_state(cfg, with_iqcorr=with_iqcorr)
        _, outs = jax.jit(lambda s, b: receiver.run_blocks(
            params, s, b, cfg))(st, blocks)
        return outs

    a, b = run(False), run(True)
    for x, y in [(a.mono, b.mono), (a.left, b.left), (a.right, b.right),
                 (a.rds_symbols, b.rds_symbols)]:
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_recovery_under_multipath():
    """The ellipse fit stays useful when the channel is NOT constant
    modulus: two urban echoes thicken the circle into an annulus, yet
    an imbalanced+offset tuner still corrects from 21.2 to 32.4 dB of
    separation (the annulus' symmetric scatter biases the fit toward
    the identity, not away from it)."""
    cfg = get_mode(0)
    n_blocks = 12
    n_audio = n_blocks * cfg.audio_per_block
    lf, rf = 800.0, 2400.0
    iq = txfm.synthesize(
        cfg, n_blocks,
        left=txfm.tone(lf, cfg.audio_fs, n_audio, amp=0.8),
        right=txfm.tone(rf, cfg.audio_fs, n_audio, amp=0.8),
        multipath=[(24, 0.35 * np.exp(1j * 2.0)),
                   (60, 0.2 * np.exp(-1j * 0.7))],
        dc_i=0.1, dc_q=-0.06, iq_gain=0.72, iq_phase_deg=18.0)
    params = receiver.make_params(cfg)
    blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))

    def run(wc):
        st = receiver.init_state(cfg, with_iqcorr=wc)
        _, outs = jax.jit(lambda s, b: receiver.run_blocks(
            params, s, b, cfg))(st, blocks)
        return _sep_db(outs, lf, rf, cfg.audio_fs)

    off, on = run(False), run(True)
    assert on - off > 8.0, (off, on)
    assert on > 28.0, on


def test_ellipse_fit_fuzz():
    """Property: for random in-range faults the fit inverts the model
    (constant-modulus stream, no noise -> near-exact recovery)."""
    rng = np.random.default_rng(42)
    n = 1 << 14
    phase = np.cumsum(1.2 * rng.standard_normal(n))
    i, q = np.cos(phase), np.sin(phase)
    for trial in range(12):
        g = float(rng.uniform(0.5, 1.4))
        ph = float(rng.uniform(-35.0, 35.0))
        di = float(rng.uniform(-0.2, 0.2))
        dq = float(rng.uniform(-0.2, 0.2))
        io, qo = iqcorr.impair(i, q, dc_i=di, dc_q=dq, gain=g,
                               phase_deg=ph)
        st = iqcorr.estimate(jnp.asarray(io), jnp.asarray(qo),
                             iqcorr.init_iqcorr_state())
        c = iqcorr.coeffs(st, deadband=0.0, deadband_dc=0.0)
        phi = np.deg2rad(ph)
        assert abs(float(c.dc_i) - di) < 5e-3, (trial, g, ph, di, dq)
        assert abs(float(c.dc_q) - dq) < 5e-3
        assert abs(float(c.rho) - g * np.sin(phi)) < 1.5e-2
        assert abs(float(c.s) - 1.0 / (g * np.cos(phi))) < 1.5e-2
        ic, qc = iqcorr.apply(jnp.asarray(io), jnp.asarray(qo), c)
        err = np.hypot(np.asarray(ic) - i, np.asarray(qc) - q)
        assert np.sqrt(np.mean(err ** 2)) < 0.02, (trial, g, ph)
