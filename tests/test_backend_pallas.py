"""Fused audio back end (ops/backend_pallas.py) vs the stock
mix + stacked resampler + stereo-matrix composition."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from dy4tpu.config import get_mode
from dy4tpu.ops import backend_pallas, fir, mix
from dy4tpu.pipeline import receiver


@pytest.mark.parametrize("mode", [0, 1])  # the U=1 (gate-eligible) modes
def test_fused_audio_backend_matches_stock(mode):
    cfg = get_mode(mode)
    rng = np.random.default_rng(3)
    c, n = 3, cfg.if_per_block
    h = jnp.asarray(rng.standard_normal(cfg.audio_taps)
                    .astype(np.float32) * 0.05)
    fmd = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    sb = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    nco = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    mt = jnp.asarray(rng.standard_normal((c, cfg.audio_taps - 1))
                     .astype(np.float32))
    st = jnp.asarray(rng.standard_normal((c, cfg.audio_taps - 1))
                     .astype(np.float32))

    sm = mix.mix(nco, sb, gain=2.0)
    y, ntl = fir.block_fir_resample(
        jnp.stack([fmd, sm], axis=-2), h, jnp.stack([mt, st], axis=-2),
        up=1, down=cfg.audio_down, precision=lax.Precision.HIGHEST)
    l_r, r_r = mix.stereo_matrix(y[..., 0, :], y[..., 1, :])

    mono, left, right, nmt, nst = backend_pallas.fused_audio_backend(
        fmd, sb, nco, h, mt, st, cfg.audio_down, mm_dtype=jnp.float32,
        interpret=True)
    np.testing.assert_allclose(np.asarray(mono), np.asarray(y[..., 0, :]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(left), np.asarray(l_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(right), np.asarray(r_r),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(nmt),
                                  np.asarray(ntl[..., 0, :]))
    np.testing.assert_array_equal(np.asarray(nst),
                                  np.asarray(ntl[..., 1, :]))


def test_back_step_fused_wiring(monkeypatch):
    """back_step(backend="fused") threads batch dims and state fields
    correctly (interpreter mode)."""
    monkeypatch.setattr(
        backend_pallas, "fused_audio_backend",
        functools.partial(backend_pallas.fused_audio_backend,
                          interpret=True))
    cfg = get_mode(0)
    rng = np.random.default_rng(4)
    c, n = 2, cfg.if_per_block
    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg, batch=(c,))
    fs = receiver.front_state_of(state)
    bs0 = receiver.back_state_of(state)
    blk = jnp.asarray(rng.integers(0, 256, (c, cfg.block_size),
                                   dtype=np.uint8))
    _, fo = receiver.front_step(params, fs, blk, cfg, frontend="stock")
    nco = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    nco_i = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    nco_q = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))

    bs_s, bo_s = receiver.back_step(params, bs0, fo, nco, nco_i, nco_q,
                                    cfg, backend="stock")
    bs_f, bo_f = receiver.back_step(params, bs0, fo, nco, nco_i, nco_q,
                                    cfg, backend="fused",
                                    precision=lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(bo_f.mono), np.asarray(bo_s.mono),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(bo_f.left), np.asarray(bo_s.left),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bs_f.mono_tail),
                                  np.asarray(bs_s.mono_tail))
    np.testing.assert_allclose(np.asarray(bs_f.stereo_tail),
                               np.asarray(bs_s.stereo_tail), atol=1e-6)
    # RDS leg untouched by the backend knob
    np.testing.assert_array_equal(np.asarray(bo_f.bb_i),
                                  np.asarray(bo_s.bb_i))


def test_fused_backend_gate():
    assert receiver.fused_backend_ok(get_mode(0))
    assert receiver.fused_backend_ok(get_mode(1))
    assert not receiver.fused_backend_ok(get_mode(2))  # U=147
    assert not receiver.fused_backend_ok(get_mode(3))


def test_backend_fused_rejects_polyphase_mode_loudly():
    """Forcing backend='fused' on a U=147 mode must raise a clear
    ValueError (gate check), not die inside the kernel's asserts —
    the DY4TPU_BACKEND env override takes this same path."""
    cfg = get_mode(2)
    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg)
    fs = receiver.front_state_of(state)
    blk = jnp.zeros(cfg.block_size, jnp.uint8)
    _, fo = receiver.front_step(params, fs, blk, cfg, frontend="stock")
    nco = jnp.zeros(cfg.if_per_block)
    with pytest.raises(ValueError, match="U=1 mode"):
        receiver.back_step(params, receiver.back_state_of(state), fo,
                           nco, nco, nco, cfg, backend="fused")
