"""Accuracy + wiring tests for the bounded-domain NCO trig (ops/trig.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dy4tpu.ops import trig, pll


def test_sincos_accuracy_nco_domain():
    # the PLL arg domain: wrapped phases * scale <= 16*pi plus adjusts
    x = np.linspace(-64.0, 64.0, 1_000_001).astype(np.float32)
    s, c = jax.jit(trig.sincos)(x)
    ref_s = np.sin(x.astype(np.float64))
    ref_c = np.cos(x.astype(np.float64))
    assert np.max(np.abs(np.asarray(s) - ref_s)) < 5e-7
    assert np.max(np.abs(np.asarray(c) - ref_c)) < 5e-7


def test_sincos_accuracy_full_bound():
    x = np.linspace(-trig.BOUND, trig.BOUND, 400_003).astype(np.float32)
    s, c = jax.jit(trig.sincos)(x)
    # at |x| ~ 2048 the f32 *input* itself only resolves ~1e-4 rad;
    # the kernel must not add more than the same order
    assert np.max(np.abs(np.asarray(s) - np.sin(x.astype(np.float64)))) < 1e-6
    assert np.max(np.abs(np.asarray(c) - np.cos(x.astype(np.float64)))) < 1e-6


def test_sincos_exact_points():
    x = np.array([0.0, np.pi / 2, np.pi, -np.pi / 2, 2 * np.pi],
                 np.float32)
    s, c = trig.sincos(x)
    np.testing.assert_allclose(np.asarray(s), np.sin(x), atol=3e-7)
    np.testing.assert_allclose(np.asarray(c), np.cos(x), atol=3e-7)


def test_pll_poly_vs_libm_nco(monkeypatch):
    """The PLL NCO stream with the poly kernel matches the libm one to
    float tolerance (same phases, trig differs only in final rounding)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(3, 2, 512)).astype(np.float32))
    st = pll.init_state((3, 2))
    kw = dict(freq=np.array([19e3, 114e3], np.float32), fs=240e3,
              nco_scale=np.array([2.0, 0.5], np.float32),
              norm_bandwidth=np.array([0.01, 0.001], np.float32),
              impl="scan")
    monkeypatch.setenv("DY4TPU_NCO_TRIG", "poly")
    i_p, q_p, st_p = pll.pll(x, st, **kw)
    monkeypatch.setenv("DY4TPU_NCO_TRIG", "libm")
    i_l, q_l, st_l = pll.pll(x, st, **kw)
    np.testing.assert_allclose(np.asarray(i_p), np.asarray(i_l), atol=1e-6)
    np.testing.assert_allclose(np.asarray(q_p), np.asarray(q_l), atol=1e-6)
    # phase carries are trig-independent
    np.testing.assert_array_equal(np.asarray(st_p.phase_est),
                                  np.asarray(st_l.phase_est))
