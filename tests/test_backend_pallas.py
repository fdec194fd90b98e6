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


@pytest.mark.parametrize("bc", [None, 32])  # serving + big channel tile
@pytest.mark.parametrize("mode", [0, 1])  # the U=1 (gate-eligible) modes
def test_fused_audio_backend_matches_stock(mode, bc):
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
        bc_rows=bc, interpret=True)
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
    # round 3: the rational kernel (ops/resample_pallas.py) qualifies the
    # U=147 modes too — every preset mode now has a fused audio back end
    for m in range(4):
        assert receiver.fused_backend_ok(get_mode(m)), m
    assert receiver.fused_rds_backend_ok(get_mode(0))
    assert receiver.fused_rds_backend_ok(get_mode(2))
    assert not receiver.fused_rds_backend_ok(get_mode(1))  # no RDS


def test_backend_fused_rejects_unsupported_geometry_loudly(monkeypatch):
    """Forcing backend='fused' on a gate-failing geometry must raise a
    clear ValueError, not die inside the kernel's asserts — the
    DY4TPU_BACKEND env override takes this same path."""
    cfg = get_mode(2)
    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg)
    fs = receiver.front_state_of(state)
    blk = jnp.zeros(cfg.block_size, jnp.uint8)
    _, fo = receiver.front_step(params, fs, blk, cfg, frontend="stock")
    nco = jnp.zeros(cfg.if_per_block)
    monkeypatch.setattr(receiver, "fused_backend_ok", lambda _: False)
    with pytest.raises(ValueError, match="backend='fused'"):
        receiver.back_step(params, receiver.back_state_of(state), fo,
                           nco, nco, nco, cfg, backend="fused")


@pytest.mark.parametrize("bc", [None, 32])  # serving + big-M channel tile
@pytest.mark.parametrize("mode", [2, 3])  # the U=147 polyphase modes
def test_fused_audio_backend_rational_matches_stock(mode, bc):
    from dy4tpu.ops import resample_pallas

    cfg = get_mode(mode)
    rng = np.random.default_rng(6)
    c, n = 3, cfg.if_per_block
    u, d = cfg.audio_up, cfg.audio_down
    h = jnp.asarray(rng.standard_normal(cfg.audio_taps)
                    .astype(np.float32) * 0.02)
    fmd = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    sb = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    nco = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    s = fir.state_len(cfg.audio_taps, u)
    mt = jnp.asarray(rng.standard_normal((c, s)).astype(np.float32))
    st = jnp.asarray(rng.standard_normal((c, s)).astype(np.float32))

    sm = mix.mix(nco, sb, gain=2.0)
    y, ntl = fir.block_fir_resample(
        jnp.stack([fmd, sm], -2), h, jnp.stack([mt, st], -2),
        up=u, down=d, precision=lax.Precision.HIGHEST)
    l_r, r_r = mix.stereo_matrix(y[..., 0, :], y[..., 1, :])

    mono, left, right, nmt, nst = (
        resample_pallas.fused_audio_backend_rational(
            fmd, sb, nco, h, mt, st, u, d, mm_dtype=jnp.float32,
            bc_rows=bc, interpret=True))
    np.testing.assert_allclose(np.asarray(mono), np.asarray(y[..., 0, :]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(left), np.asarray(l_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(right), np.asarray(r_r),
                               atol=1e-5)
    # resampler tails are copies of the input stream: exact
    np.testing.assert_array_equal(np.asarray(nmt),
                                  np.asarray(ntl[..., 0, :]))
    np.testing.assert_array_equal(np.asarray(nst),
                                  np.asarray(ntl[..., 1, :]))


@pytest.mark.parametrize("bc", [None, 32])  # serving + big-M channel tile
@pytest.mark.parametrize("mode", [0, 2])  # the RDS-capable modes
def test_fused_rds_backend_matches_stock(mode, bc):
    from dy4tpu.ops import resample_pallas

    cfg = get_mode(mode)
    rng = np.random.default_rng(7)
    c, n = 3, cfg.if_per_block
    u, d = cfg.rds_up, cfg.rds_down
    h = jnp.asarray(rng.standard_normal(cfg.rds_taps)
                    .astype(np.float32) * 0.02)
    h2 = jnp.asarray(rng.standard_normal(cfg.rds_rrc_taps)
                     .astype(np.float32) * 0.1)
    rds = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    ni = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    nq = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
    s = fir.state_len(cfg.rds_taps, u)
    s2 = cfg.rds_rrc_taps - 1
    lti = jnp.asarray(rng.standard_normal((c, s)).astype(np.float32))
    ltq = jnp.asarray(rng.standard_normal((c, s)).astype(np.float32))
    rti = jnp.asarray(rng.standard_normal((c, s2)).astype(np.float32))
    rtq = jnp.asarray(rng.standard_normal((c, s2)).astype(np.float32))

    mixed = jnp.stack([mix.mix(ni, rds, gain=1.0),
                       mix.mix(nq, rds, gain=1.0)], -2)
    lp, nlt = fir.block_fir_resample(
        mixed, h, jnp.stack([lti, ltq], -2), up=u, down=d,
        precision=lax.Precision.HIGHEST)
    bb, _ = fir.block_fir(lp, h2, jnp.stack([rti, rtq], -2),
                          precision=lax.Precision.HIGHEST)

    bbi, bbq, nli, nlq, nri, nrq = resample_pallas.fused_rds_backend(
        rds, ni, nq, h, h2, lti, ltq, rti, rtq, u, d,
        mm_dtype=jnp.float32, bc_rows=bc, interpret=True)
    np.testing.assert_allclose(np.asarray(bbi), np.asarray(bb[..., 0, :]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(bbq), np.asarray(bb[..., 1, :]),
                               atol=1e-5)
    # lpf tails copy the mixed input stream: exact; rrc tails are the
    # recomputed resampler OUTPUT: fp tolerance
    np.testing.assert_array_equal(np.asarray(nli),
                                  np.asarray(nlt[..., 0, :]))
    np.testing.assert_array_equal(np.asarray(nlq),
                                  np.asarray(nlt[..., 1, :]))
    np.testing.assert_allclose(np.asarray(nri),
                               np.asarray(lp[..., 0, -s2:]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nrq),
                               np.asarray(lp[..., 1, -s2:]), atol=1e-5)


def test_back_step_fused_rds_wiring(monkeypatch):
    """back_step with the fused RDS backend (env knob) threads batch
    dims and all four RDS state tails correctly (interpreter mode)."""
    from dy4tpu.ops import resample_pallas

    monkeypatch.setenv("DY4TPU_RDS_BACKEND", "fused")
    monkeypatch.setattr(
        resample_pallas, "fused_rds_backend",
        functools.partial(resample_pallas.fused_rds_backend,
                          interpret=True))
    cfg = get_mode(0)
    rng = np.random.default_rng(8)
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

    bs_f, bo_f = receiver.back_step(params, bs0, fo, nco, nco_i, nco_q,
                                    cfg, backend="stock",
                                    precision=lax.Precision.HIGHEST)
    monkeypatch.setenv("DY4TPU_RDS_BACKEND", "stock")
    bs_s, bo_s = receiver.back_step(params, bs0, fo, nco, nco_i, nco_q,
                                    cfg, backend="stock",
                                    precision=lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(bo_f.bb_i),
                               np.asarray(bo_s.bb_i), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bo_f.bb_q),
                               np.asarray(bo_s.bb_q), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bs_f.lpf_tail_i),
                                  np.asarray(bs_s.lpf_tail_i))
    np.testing.assert_allclose(np.asarray(bs_f.rrc_tail_q),
                               np.asarray(bs_s.rrc_tail_q), atol=1e-5)
    # audio leg untouched by the RDS knob
    np.testing.assert_array_equal(np.asarray(bo_f.mono),
                                  np.asarray(bo_s.mono))
