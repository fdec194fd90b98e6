"""Pilot-lock SNR estimate + weak-signal stereo blend (beyond-parity).

The reference always emits full stereo separation; real receivers fade
the (noisier) difference channel out as the signal weakens.  Pins:

1. blend algebra: g=1 is the identity, g=0 collapses to mono;
2. the pilot-SNR estimator reads high on a clean stereo broadcast,
   low on a noisy one, and floor-level on a pilot-less (mono) TX;
3. e2e: on a noisy capture the blended output's L/R difference power
   drops by an order of magnitude while the sum channel is untouched.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dy4tpu.config import get_mode
from dy4tpu.ops import mix
from dy4tpu.pipeline import receiver
from dy4tpu.tx import fm

cfg = get_mode(0)


def _run(iq, n_blocks):
    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg)
    blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))
    state, outs = jax.jit(
        lambda s, b: receiver.run_blocks(params, s, b, cfg))(state, blocks)
    return outs


def _capture(n_blocks, noise=0.0, pilot=True):
    n_audio = n_blocks * cfg.audio_per_block
    left = fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.8)
    right = fm.tone(2400.0, cfg.audio_fs, n_audio, amp=0.8)
    kw = dict(left=left, right=right, noise=noise)
    if not pilot:
        kw.update(a_pilot=0.0, a_stereo=0.0)
    return fm.synthesize(cfg, n_blocks, **kw)


def test_blend_algebra():
    rng = np.random.default_rng(0)
    l = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    hi = jnp.full((2,), 30.0)      # >= full_db -> identity
    lo = jnp.full((2,), -10.0)     # <= mono_db -> mono
    bl, br = mix.stereo_blend(l, r, hi)
    np.testing.assert_allclose(np.asarray(bl), np.asarray(l), atol=1e-6)
    np.testing.assert_allclose(np.asarray(br), np.asarray(r), atol=1e-6)
    bl, br = mix.stereo_blend(l, r, lo)
    m = 0.5 * (np.asarray(l) + np.asarray(r))
    np.testing.assert_allclose(np.asarray(bl), m, atol=1e-6)
    np.testing.assert_allclose(np.asarray(br), m, atol=1e-6)


def test_pilot_snr_estimator_levels():
    """Measured curve (0.8-amp tone program): clean reads ~16.5 dB (the
    floor is multiplex leakage through the 101-tap pilot BPF, not
    channel noise), noise=1.2 reads ~5.9 dB with stereo separation
    already degraded to ~15 dB, and a pilot-less TX reads ~-32 dB."""
    n_blocks = 6
    snr_clean = np.asarray(
        _run(_capture(n_blocks), n_blocks).pilot_snr_db)[2:]
    snr_noisy = np.asarray(
        _run(_capture(n_blocks, noise=1.2), n_blocks).pilot_snr_db)[2:]
    snr_nopilot = np.asarray(
        _run(_capture(n_blocks, pilot=False), n_blocks).pilot_snr_db)[2:]
    assert snr_clean.mean() > 15.0, snr_clean
    assert snr_clean.mean() > snr_noisy.mean() + 6.0, (snr_clean, snr_noisy)
    # no pilot: the estimator must NOT report a confident lock
    assert snr_nopilot.mean() < 0.0, snr_nopilot


def test_blend_collapses_noisy_stereo_not_clean():
    n_blocks = 8
    for noise, expect_stereo in ((0.0, True), (1.2, False)):
        outs = _run(_capture(n_blocks, noise=noise), n_blocks)
        bl, br = mix.stereo_blend(outs.left, outs.right, outs.pilot_snr_db)
        l, r = np.asarray(outs.left)[3:], np.asarray(outs.right)[3:]
        bl, br = np.asarray(bl)[3:], np.asarray(br)[3:]
        diff_raw = np.mean((l - r) ** 2)
        diff_blend = np.mean((bl - br) ** 2)
        sum_raw = np.mean((l + r) ** 2)
        sum_blend = np.mean((bl + br) ** 2)
        # the sum (mono) channel is preserved by the blend algebra
        np.testing.assert_allclose(sum_blend, sum_raw, rtol=1e-5)
        if expect_stereo:
            # clean: ~16.5 dB > full_db=14 -> identity
            np.testing.assert_allclose(diff_blend, diff_raw, rtol=1e-3)
        else:
            # ~5.9 dB -> g ~ 0.2, difference power scales by g^2
            assert diff_blend < 0.15 * diff_raw, (diff_blend, diff_raw)
