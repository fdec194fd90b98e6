"""FM de-emphasis (ops/deemph.py): golden vs scipy lfilter, block
continuity, the analog -3 dB point, and the CLI flag end-to-end.

Beyond-parity stage — the reference has no de-emphasis (its audio path
ends at the resampler, src/project.cpp:95-134), so the golden here is
the textbook single-pole IIR, not the reference model.
"""

import subprocess
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from dy4tpu.ops import deemph


def _lfilter_golden(x, a, y0=0.0):
    """y[n] = a*y[n-1] + (1-a)*x[n], sequential float64."""
    y = np.empty_like(x, dtype=np.float64)
    prev = y0
    for n in range(len(x)):
        prev = a * prev + (1.0 - a) * x[n]
        y[n] = prev
    return y


def test_matches_sequential_recurrence():
    a = deemph.deemph_coeff(48e3, deemph.TAU_US_75)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1024).astype(np.float32)
    want = _lfilter_golden(x, a, y0=0.37)

    y, last = deemph.deemphasis_block(jnp.asarray(x),
                                      jnp.asarray(0.37, jnp.float32), a)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)
    assert np.asarray(last) == np.asarray(y)[-1]


def test_block_continuity():
    """One 2N block == two N blocks with carried state (allclose: the
    associative scan reassociates the products across the split)."""
    a = deemph.deemph_coeff(48e3)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 2048)).astype(np.float32)

    y_full, _ = deemph.deemphasis_block(jnp.asarray(x),
                                        jnp.zeros(3, jnp.float32), a)
    y1, st = deemph.deemphasis_block(jnp.asarray(x[:, :1024]),
                                     jnp.zeros(3, jnp.float32), a)
    y2, _ = deemph.deemphasis_block(jnp.asarray(x[:, 1024:]), st, a)
    np.testing.assert_allclose(
        np.asarray(y_full), np.concatenate([y1, y2], -1),
        atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("tau,fs", [(deemph.TAU_US_75, 48e3),
                                    (deemph.TAU_EU_50, 44.1e3)])
def test_corner_frequency_response(tau, fs):
    """|H| at the analog corner 1/(2*pi*tau) is ~-3 dB, and the 15 kHz
    rolloff matches the analog RC curve within 2 dB (the
    impulse-invariant pole is exact in phase increment, up to ~1.7 dB
    light in attenuation as f approaches Nyquist — 15 kHz is 0.68 fN
    at 44.1 kS/s)."""
    a = deemph.deemph_coeff(fs, tau)
    n = 65536

    def gain_db(f):
        t = np.arange(n) / fs
        x = np.sin(2 * np.pi * f * t).astype(np.float32)
        y, _ = deemph.deemphasis_block(jnp.asarray(x),
                                       jnp.asarray(0.0, jnp.float32), a)
        seg = np.asarray(y)[n // 2:]
        return 20 * np.log10(np.sqrt(2) * np.sqrt(np.mean(seg ** 2)))

    fc = 1.0 / (2 * np.pi * tau)
    analog = lambda f: -10 * np.log10(1 + (f / fc) ** 2)  # noqa: E731
    assert abs(gain_db(fc) - (-3.01)) < 1.0
    assert abs(gain_db(15e3) - analog(15e3)) < 2.0


def test_cli_deemphasis_flag(tmp_path):
    """`--deemphasis us` runs end-to-end and audibly attenuates a high
    tone relative to the default (parity) path."""
    from dy4tpu.config import get_mode
    from dy4tpu.tx import fm

    cfg = get_mode(0)
    n_blocks = 6
    n_audio = n_blocks * cfg.audio_per_block
    wb = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(12e3, cfg.audio_fs, n_audio, amp=0.5),
                       right=fm.tone(12e3, cfg.audio_fs, n_audio, amp=0.5))
    raw = tmp_path / "iq.raw"
    np.asarray(wb).tofile(raw)

    def run(extra):
        out = tmp_path / f"pcm_{len(extra)}.raw"
        cmd = [sys.executable, "-m", "dy4tpu", "0", "m",
               "--input", str(raw), "--output", str(out), *extra]
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=600,
                           env={**__import__("os").environ,
                                "DY4TPU_PLATFORM": "cpu"})
        assert r.returncode == 0, r.stderr
        pcm = np.fromfile(out, "<i2").astype(np.float64)
        return np.sqrt(np.mean(pcm[len(pcm) // 2:] ** 2))

    rms_flat = run([])
    rms_de = run(["--deemphasis", "us"])
    # analog curve at 12 kHz / 75 us: ~-17.2 dB
    ratio_db = 20 * np.log10(rms_de / rms_flat)
    assert -20.0 < ratio_db < -13.0, ratio_db
