"""Golden parity: run the ACTUAL reference Python model (mounted read-only
at /root/reference/model) against our ops on the same inputs.

This is the reference project's own methodology — model first, then demand
equivalence (3dy4-project-2024.pdf p.5) — pointed back at the reference:
float stages must agree to fp32 tolerance, integer/decision stages exactly.

The reference code is executed, never copied.  Skipped wholesale if the
mount is absent.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REF_MODEL = "/root/reference/model"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_MODEL),
                                reason="reference model not mounted")

if os.path.isdir(REF_MODEL):
    import matplotlib
    matplotlib.use("Agg")  # fmMonoBlock imports pyplot at module scope
    sys.path.insert(0, REF_MODEL)
    import fmMonoBlock as ref_block          # noqa: E402
    import fmRRC as ref_rrc                  # noqa: E402
    import fmSupportLib as ref_lib           # noqa: E402

from dy4tpu.ops import demod, fft, fir, firdes, mix, pll  # noqa: E402

RNG = np.random.default_rng(11)


def test_demod_diff_matches_reference_model():
    i = RNG.normal(size=600).astype(np.float32)
    q = RNG.normal(size=600).astype(np.float32)
    ref1, pi_, pq_ = ref_block.fmDemodArctanCustom(i[:300], q[:300])
    ref2, _, _ = ref_block.fmDemodArctanCustom(i[300:], q[300:], pi_, pq_)
    out1, jpi, jpq = demod.fm_demod_diff(jnp.asarray(i[:300]),
                                         jnp.asarray(q[:300]),
                                         jnp.zeros(()), jnp.zeros(()))
    out2, _, _ = demod.fm_demod_diff(jnp.asarray(i[300:]),
                                     jnp.asarray(q[300:]), jpi, jpq)
    np.testing.assert_allclose(np.asarray(out1), ref1, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2), ref2, atol=1e-4)


def test_demod_arctan_matches_reference_model():
    t = np.arange(2000) / 240e3
    phase = 2 * np.pi * 10e3 * t + 0.4 * np.sin(2 * np.pi * 250 * t)
    i = np.cos(phase).astype(np.float32)
    q = np.sin(phase).astype(np.float32)
    ref, _ = ref_lib.fmDemodArctan(i, q)
    out, _ = demod.fm_demod_arctan(jnp.asarray(i), jnp.asarray(q),
                                   jnp.zeros(()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)


def test_block_convolve_matches_reference_model():
    h = RNG.normal(size=101).astype(np.float32)
    x = RNG.normal(size=512).astype(np.float32)
    state = RNG.normal(size=100).astype(np.float32)
    ref, ref_state = ref_block.convolve(x, h, state)
    out, out_state = fir.block_fir(jnp.asarray(x), jnp.asarray(h),
                                   jnp.asarray(state))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_state), ref_state, atol=0)


@pytest.mark.parametrize("up,down,taps", [(19, 120, 101 * 19), (1, 5, 101)])
def test_resampler_matches_reference_model(up, down, taps):
    h = RNG.normal(size=taps).astype(np.float32)
    n = 960
    x = RNG.normal(size=n).astype(np.float32)
    state = RNG.normal(size=fir.state_len(taps, up)).astype(np.float32)
    ref, ref_state = ref_block.resampler(up, down, x, h, state)
    out, out_state = fir.block_fir_resample(jnp.asarray(x), jnp.asarray(h),
                                            jnp.asarray(state),
                                            up=up, down=down)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_state), ref_state, atol=0)


def _ref_pll_state():
    st = ref_block.EmptyObject()
    st.integrator = 0.0
    st.phaseEst = 0.0
    st.feedbackI = 1.0
    st.feedbackQ = 0.0
    st.ncoState = 1.0
    st.q_ncoState = 1.0
    st.trigOffset = 0
    return st


@pytest.mark.parametrize("freq,scale,bw", [(19e3, 2.0, 0.01),
                                           (114e3, 0.5, 0.001)])
def test_pll_matches_reference_model(freq, scale, bw):
    fs = 240e3
    t = np.arange(6144) / fs
    x = (np.cos(2 * np.pi * freq * t + 0.8)
         + 0.05 * RNG.normal(size=len(t))).astype(np.float32)

    ref_st = _ref_pll_state()
    r1, rq1 = ref_block.fmPll(x[:3072], freq, fs, ncoScale=scale,
                              normBandwidth=bw, state=ref_st)
    r2, rq2 = ref_block.fmPll(x[3072:], freq, fs, ncoScale=scale,
                              normBandwidth=bw, state=ref_st)

    st = pll.init_state()
    o1, q1, st = pll.pll(jnp.asarray(x[:3072]), st, freq=freq, fs=fs,
                         nco_scale=scale, norm_bandwidth=bw)
    o2, q2, st = pll.pll(jnp.asarray(x[3072:]), st, freq=freq, fs=fs,
                         nco_scale=scale, norm_bandwidth=bw)
    np.testing.assert_allclose(np.asarray(o1), r1, atol=5e-3)
    np.testing.assert_allclose(np.asarray(o2), r2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(q2), rq2, atol=5e-3)


def test_rrc_matches_reference_model():
    fs = 16 * 2375.0
    ref = ref_rrc.impulseResponseRootRaisedCosine(fs, 101)
    ours = firdes.rrc(fs, 101, 2375.0)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_psd_matches_reference_model():
    fs = 48e3
    x = RNG.normal(size=4096).astype(np.float32)
    ref_freq, ref = ref_lib.estimatePSD(x, 512, fs)
    our_freq, ours = fft.estimate_psd(jnp.asarray(x), nfft=512, fs=fs)
    np.testing.assert_allclose(our_freq, ref_freq[:len(our_freq)])
    ref = np.asarray(ref).ravel()
    ours = np.asarray(ours).ravel()
    assert ref.shape == ours.shape
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_delay_block_matches_reference_model():
    x = RNG.normal(size=256).astype(np.float32)
    st = RNG.normal(size=50).astype(np.float32)
    ref, ref_st = ref_block.delayBlock(x, st)
    out, out_st = mix.delay_block(jnp.asarray(x), jnp.asarray(st))
    np.testing.assert_allclose(np.asarray(out), ref, atol=0)
    np.testing.assert_allclose(np.asarray(out_st), ref_st, atol=0)


def test_reference_tx_checkword_typo_documented():
    """The reference frame_sync_transmitter's p[9] row adds b[13] twice
    (fmMonoBlock.py:145) — mod 2 this *drops* b[13] vs the spec matrix.
    Our encoder follows the spec (rds/coding.py), so a reference-encoded
    block-A checkword must differ from ours exactly when the message has
    b[13] ^ b[3] asymmetry in that parity row.  Pin the discrepancy so it
    stays a documented deviation, not an accident."""
    from dy4tpu.rds import coding

    msg_bits = [0] * 16
    msg_bits[13] = 1  # excites the typo'd row
    packet = ref_block.frame_sync_transmitter(list(msg_bits))
    ref_block26 = coding.int_of(packet.a)
    ours = coding.encode_block(coding.int_of(msg_bits), "A")
    assert ref_block26 != ours
    # and ours is the self-consistent one: its syndrome matches offset A
    assert coding.syndrome(ours) == coding.OFFSET_WORDS["A"]
