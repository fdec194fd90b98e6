import numpy as np

import jax.numpy as jnp

from dy4tpu.ops import demod, pll
import naive

RNG = np.random.default_rng(7)


def test_fm_demod_diff_matches_naive_with_state():
    i = RNG.normal(size=400).astype(np.float32)
    q = RNG.normal(size=400).astype(np.float32)
    i[37] = q[37] = 0.0  # exercise the zero-power guard

    out1, pi, pq = demod.fm_demod_diff(
        jnp.asarray(i[:200]), jnp.asarray(q[:200]),
        jnp.zeros(()), jnp.zeros(()))
    out2, _, _ = demod.fm_demod_diff(
        jnp.asarray(i[200:]), jnp.asarray(q[200:]), pi, pq)

    ref1, ri, rq = naive.fm_demod_diff(i[:200], q[:200])
    ref2, _, _ = naive.fm_demod_diff(i[200:], q[200:], ri, rq)
    np.testing.assert_allclose(np.asarray(out1), ref1, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2), ref2, atol=1e-4)


def test_fm_demod_recovers_tone():
    # FM-modulate a 1 kHz tone and check the demodulated output contains it
    fs = 240e3
    t = np.arange(24000) / fs
    msg = np.cos(2 * np.pi * 1e3 * t)
    kf = 20e3  # keep per-sample phase steps small for the differentiator
    phase = 2 * np.pi * kf * np.cumsum(msg) / fs
    i, q = np.cos(phase).astype(np.float32), np.sin(phase).astype(np.float32)
    out, _, _ = demod.fm_demod_diff(jnp.asarray(i), jnp.asarray(q),
                                    jnp.zeros(()), jnp.zeros(()))
    out = np.asarray(out)[10:]
    # correlate against the message: demod output ~ d(phase)/dt ~ msg
    c = np.corrcoef(out, msg[10:])[0, 1]
    assert c > 0.99


def test_fm_demod_arctan_variant():
    fs = 240e3
    t = np.arange(4800) / fs
    phase = 2 * np.pi * 10e3 * t + 0.3 * np.sin(2 * np.pi * 300 * t)
    i = np.cos(phase).astype(np.float32)
    q = np.sin(phase).astype(np.float32)
    out, last = demod.fm_demod_arctan(jnp.asarray(i), jnp.asarray(q),
                                      jnp.zeros(()))
    ref = np.diff(np.unwrap(np.arctan2(q, i)), prepend=0.0)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)


def test_pll_matches_naive_across_blocks():
    fs = 240e3
    t = np.arange(4096) / fs
    x = np.cos(2 * np.pi * 19e3 * t + 0.7).astype(np.float32)
    x += 0.05 * RNG.normal(size=len(t)).astype(np.float32)

    st = pll.init_state()
    o1, q1, st = pll.pll(jnp.asarray(x[:2048]), st, freq=19e3, fs=fs,
                         nco_scale=2.0)
    o2, q2, st = pll.pll(jnp.asarray(x[2048:]), st, freq=19e3, fs=fs,
                         nco_scale=2.0)

    ref = naive.PLL()
    r1, rq1 = ref.run(x[:2048], 19e3, fs, nco_scale=2.0)
    r2, rq2 = ref.run(x[2048:], 19e3, fs, nco_scale=2.0)

    np.testing.assert_allclose(np.asarray(o1), r1, atol=2e-3)
    np.testing.assert_allclose(np.asarray(o2), r2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(q2), rq2, atol=2e-3)


def test_pll_locks_and_doubles_frequency():
    # pilot at 19 kHz with phase offset; NCO x2 should converge to 38 kHz
    fs = 240e3
    n = 8192
    t = np.arange(n) / fs
    x = np.cos(2 * np.pi * 19e3 * t + 1.1).astype(np.float32)
    st = pll.init_state()
    nco, _, st = pll.pll(jnp.asarray(x), st, freq=19e3, fs=fs, nco_scale=2.0)
    tail = np.asarray(nco)[-2048:]
    want = np.cos(2 * np.pi * 38e3 * t + 2.2)[-2048:]
    # after lock the NCO should track cos(2*(19k t + phi)) closely
    err = np.mean(np.abs(tail - want))
    assert err < 0.05, err


def test_pll_batched():
    fs = 240e3
    t = np.arange(1024) / fs
    x = np.stack([np.cos(2 * np.pi * 19e3 * t + p) for p in (0.0, 0.5, 1.0)])
    st = pll.init_state(batch=(3,))
    nco, ncoq, st = pll.pll(jnp.asarray(x, jnp.float32), st,
                            freq=19e3, fs=fs, nco_scale=2.0)
    assert nco.shape == (3, 1024)
    for b in range(3):
        ref = naive.PLL()
        ri, _ = ref.run(x[b].astype(np.float32), 19e3, fs, nco_scale=2.0)
        np.testing.assert_allclose(np.asarray(nco[b]), ri, atol=2e-3)


def test_pll_fast_matches_reference_impl():
    """The algebraic scan (sign target + wrap) must track the literal
    transcription (arctan2 + trig in the loop) to float tolerance."""
    fs = 240e3
    t = np.arange(8192) / fs
    x = (np.cos(2 * np.pi * 19e3 * t + 0.4)
         + 0.1 * RNG.normal(size=len(t))).astype(np.float32)
    x[100] = 0.0  # exercise the zero-input guard

    st_a = pll.init_state()
    st_b = pll.init_state()
    for sl in (slice(0, 4096), slice(4096, 8192)):
        a_i, a_q, st_a = pll.pll(jnp.asarray(x[sl]), st_a,
                                 freq=19e3, fs=fs, nco_scale=2.0)
        b_i, b_q, st_b = pll.pll_reference(jnp.asarray(x[sl]), st_b,
                                           freq=19e3, fs=fs, nco_scale=2.0)
        np.testing.assert_allclose(np.asarray(a_i), np.asarray(b_i),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(a_q), np.asarray(b_q),
                                   atol=5e-3)


def test_fm_demod_arctan_streaming_continuity():
    """prev_phase carry: two blocks == one double-length block."""
    fs = 240e3
    t = np.arange(4000) / fs
    phase = 2 * np.pi * 12e3 * t + 0.5 * np.sin(2 * np.pi * 170 * t)
    i = np.cos(phase).astype(np.float32)
    q = np.sin(phase).astype(np.float32)

    full, _ = demod.fm_demod_arctan(jnp.asarray(i), jnp.asarray(q),
                                    jnp.zeros(()))
    h1, carry = demod.fm_demod_arctan(jnp.asarray(i[:2000]),
                                      jnp.asarray(q[:2000]), jnp.zeros(()))
    h2, _ = demod.fm_demod_arctan(jnp.asarray(i[2000:]),
                                  jnp.asarray(q[2000:]), carry)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(h1), np.asarray(h2)]), np.asarray(full),
        atol=1e-6)
