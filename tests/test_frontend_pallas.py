"""Fused Pallas front end vs the stock normalize+FIR+demod lowering.

Runs the kernel in interpreter mode on CPU (tests/conftest.py pins the
platform), comparing against ``front_step(..., frontend="stock")``
semantics: same state threading, fp32-tolerance outputs (accumulation
order differs between the in-kernel banded matmul and the conv path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from dy4tpu.config import get_mode
from dy4tpu.ops import demod, fir, frontend_pallas
from dy4tpu.pipeline import receiver

cfg = get_mode(0)


def _stock(iq_u8, h, tail, pi, pq):
    x = (iq_u8.astype(jnp.float32) - 128.0) / 128.0
    iq = jnp.moveaxis(x.reshape(*x.shape[:-1], -1, 2), -1, -2)
    iq_ds, tail2 = fir.block_fir_decim(iq, h, tail, cfg.rf_decim,
                                       precision=lax.Precision.HIGHEST)
    fm, pi2, pq2 = demod.fm_demod_diff(iq_ds[..., 0, :], iq_ds[..., 1, :],
                                       pi, pq)
    return fm, tail2, pi2, pq2


def test_fused_frontend_matches_stock_two_blocks():
    rng = np.random.default_rng(0)
    c = 3  # also exercises the channel-pad path (not a multiple of 8)
    params = receiver.make_params(cfg)
    h = params.rf_coeff
    tail = jnp.asarray(rng.standard_normal((c, 2, cfg.num_taps - 1))
                       .astype(np.float32) * 0.1)
    pi = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    pq = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    tail_f = tail
    pi_f, pq_f = pi, pq
    for _ in range(2):  # two blocks: exercises the carried state
        blk = jnp.asarray(rng.integers(0, 256, (c, cfg.block_size),
                                       dtype=np.uint8))
        ref_fm, ref_tail, ref_pi, ref_pq = _stock(blk, h, tail, pi, pq)
        fm, tail_f, pi_f, pq_f = frontend_pallas.fused_frontend(
            blk, h, tail_f, pi_f, pq_f, cfg.rf_decim,
            mm_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(fm), np.asarray(ref_fm),
                                   atol=2e-3)  # demod /power amplifies
        #   fp32 accumulation-order noise on pure-noise input
        np.testing.assert_allclose(np.asarray(tail_f), np.asarray(ref_tail),
                                   atol=0)
        np.testing.assert_allclose(np.asarray(pi_f), np.asarray(ref_pi),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(pq_f), np.asarray(ref_pq),
                                   atol=1e-5)
        tail, pi, pq = ref_tail, ref_pi, ref_pq


@pytest.mark.parametrize("mode", [0, 1])  # decim 10 and 5: distinct
#   tap-parity band plans (_hraw_plan) and output widths
def test_fused_frontend_raw_matches_stock_two_blocks(mode):
    """Raw-stream kernel variant: deinterleave/decimation in the tap
    parity, normalize folded into the dot.  fm compared power-masked —
    the /power demod amplifies fp noise at near-zero-power samples of
    the random input (real FM is constant-envelope)."""
    cfg = get_mode(mode)
    rng = np.random.default_rng(2)
    c = 3
    params = receiver.make_params(cfg)
    h = params.rf_coeff
    tail = jnp.asarray(rng.standard_normal((c, 2, cfg.num_taps - 1))
                       .astype(np.float32) * 0.1)
    pi = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    pq = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)

    def stock(iq_u8, h, tail, pi, pq):
        x = (iq_u8.astype(jnp.float32) - 128.0) / 128.0
        iq = jnp.moveaxis(x.reshape(*x.shape[:-1], -1, 2), -1, -2)
        iq_ds, tail2 = fir.block_fir_decim(iq, h, tail, cfg.rf_decim,
                                           precision=lax.Precision.HIGHEST)
        fm, pi2, pq2 = demod.fm_demod_diff(iq_ds[..., 0, :],
                                           iq_ds[..., 1, :], pi, pq)
        return fm, tail2, pi2, pq2

    tail_f, pi_f, pq_f = tail, pi, pq
    for _ in range(2):
        blk = jnp.asarray(rng.integers(0, 256, (c, cfg.block_size),
                                       dtype=np.uint8))
        ref_fm, ref_tail, ref_pi, ref_pq = stock(blk, h, tail, pi, pq)
        fm, tail_f, pi_f, pq_f = frontend_pallas.fused_frontend_raw(
            blk, h, tail_f, pi_f, pq_f, cfg.rf_decim,
            mm_dtype=jnp.float32, interpret=True)
        x = (blk.astype(jnp.float32) - 128.0) / 128.0
        iq = jnp.moveaxis(x.reshape(c, -1, 2), -1, -2)
        iq_ds, _ = fir.block_fir_decim(iq, h, tail, cfg.rf_decim,
                                       precision=lax.Precision.HIGHEST)
        power = np.asarray(iq_ds[..., 0, :] ** 2 + iq_ds[..., 1, :] ** 2)
        err = np.abs(np.asarray(fm) - np.asarray(ref_fm))
        assert err[power > 1e-3].max() < 1e-3
        np.testing.assert_allclose(np.asarray(tail_f), np.asarray(ref_tail),
                                   atol=0)
        np.testing.assert_allclose(np.asarray(pi_f), np.asarray(ref_pi),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(pq_f), np.asarray(ref_pq),
                                   atol=1e-5)
        tail, pi, pq = ref_tail, ref_pi, ref_pq


@pytest.mark.parametrize("mode,rds", [(0, True), (1, False)])
def test_fused_frontend_full_matches_stock_stream(mode, rds):
    """Full-front kernel (fm -> delays/bank/squaring/carrier in the same
    VMEM pass) vs the stock front_step composition over a 2-block
    broadcast stream, INCLUDING state interchange: the kernel's new
    FrontState field values must keep feeding the stock path and vice
    versa (same overlap-save semantics, fmMonoBlock.py:652-680)."""
    from dy4tpu.rds import coding
    from dy4tpu.tx import fm as txfm

    cfg = get_mode(mode)
    c = 2
    params = receiver.make_params(cfg, with_rds=rds)
    n_blocks = 2
    n_audio = n_blocks * cfg.audio_per_block
    bits = (coding.make_ps_bitstream(0x1234, 5, "FULLTEST", repeats=4)
            if rds else None)
    iq = txfm.synthesize(
        cfg, n_blocks,
        left=txfm.tone(800.0, cfg.audio_fs, n_audio, amp=0.7),
        right=txfm.tone(2400.0, cfg.audio_fs, n_audio, amp=0.7),
        rds_bits=bits)
    blocks = iq.reshape(n_blocks, cfg.block_size)
    st = receiver.init_state(cfg, batch=(c,), with_rds=rds)
    fs = receiver.front_state_of(st)
    for it in range(n_blocks):
        blk = (jnp.broadcast_to(jnp.asarray(blocks[it]),
                                (c, cfg.block_size)) + jnp.uint8(0))
        fs_ref, fo_ref = receiver.front_step(params, fs, blk, cfg,
                                             frontend="stock",
                                             rds_enabled=rds)
        r = frontend_pallas.fused_frontend_full(
            blk, params.rf_coeff, params.bank_coeff,
            params.rds_carrier_coeff, fs.rf.iq_tail, fs.rf.prev_i,
            fs.rf.prev_q, fs.bank_tail, fs.mono_delay, fs.carrier_tail,
            fs.rds_delay, cfg.rf_decim, rds=rds, mm_dtype=jnp.float32,
            interpret=True)
        (fmd, pilot, stereo, carrier, rdsdel, ntail, npi, npq, nbank,
         nmono, ncar, nrds, mom) = r
        assert mom is None      # no corr requested
        checks = [(fmd, fo_ref.fm_delayed, 2e-3), (pilot, fo_ref.pilot, 1e-4),
                  (stereo, fo_ref.stereo_band, 5e-4),
                  (nbank, fs_ref.bank_tail, 2e-3),
                  (nmono, fs_ref.mono_delay, 2e-3),
                  (ntail, fs_ref.rf.iq_tail, 0.0),
                  (npi, fs_ref.rf.prev_i, 1e-5),
                  (npq, fs_ref.rf.prev_q, 1e-5)]
        if rds:
            checks += [(carrier, fo_ref.carrier, 1e-5),
                       (rdsdel, fo_ref.rds_delayed, 1e-4),
                       (ncar, fs_ref.carrier_tail, 1e-3),
                       (nrds, fs_ref.rds_delay, 1e-4)]
        else:
            assert carrier is None and rdsdel is None
            assert ncar is None and nrds is None
        for a, b, tol in checks:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=max(tol, 1e-12))
        # interchange: continue BOTH paths from the stock state
        fs = fs_ref


def test_fused_frontend_full_rds_disabled_against_rds_params():
    """Runtime-disabling RDS against RDS-capable params (3-row
    bank_coeff) is legal on the stock path; the fused kernel must accept
    it too (slice, not assert) and match."""
    cfg = get_mode(0)
    rng = np.random.default_rng(11)
    c = 2
    params = receiver.make_params(cfg)          # supports_rds: 3 bands
    st = receiver.init_state(cfg, batch=(c,))   # matching 3-row state
    fs = receiver.front_state_of(st)
    blk = jnp.asarray(rng.integers(0, 256, (c, cfg.block_size),
                                   dtype=np.uint8))
    _, fo_ref = receiver.front_step(params, fs, blk, cfg,
                                    frontend="stock", rds_enabled=False)
    r = frontend_pallas.fused_frontend_full(
        blk, params.rf_coeff, params.bank_coeff, params.rds_carrier_coeff,
        fs.rf.iq_tail, fs.rf.prev_i, fs.rf.prev_q, fs.bank_tail,
        fs.mono_delay, None, None, cfg.rf_decim, rds=False,
        mm_dtype=jnp.float32, interpret=True)
    assert r[3] is None and r[4] is None       # carrier / rds_delayed
    np.testing.assert_allclose(np.asarray(r[1]), np.asarray(fo_ref.pilot),
                               atol=1e-4)


@pytest.mark.parametrize("k,decim", [(51, 4), (129, 8), (75, 3)])
def test_fused_frontend_raw_geometry_fuzz(k, decim):
    """Raw kernel across non-mode geometries (tap counts that do NOT
    phase-align to the decimation, odd k, decim without a mode): the
    tap-parity band plan must hold wherever the gate condition
    2*(k-1) <= 2*128*decim does."""
    rng = np.random.default_rng(k * decim)
    c, n_out = 2, 256
    bs = 2 * n_out * decim
    h = rng.standard_normal(k).astype(np.float32) * 0.05
    hj = jnp.asarray(h)
    tail = jnp.asarray(rng.standard_normal((c, 2, k - 1))
                       .astype(np.float32) * 0.1)
    pi = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    pq = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    blk = jnp.asarray(rng.integers(0, 256, (c, bs), dtype=np.uint8))

    x = (blk.astype(jnp.float32) - 128.0) / 128.0
    iq = jnp.moveaxis(x.reshape(c, -1, 2), -1, -2)
    iq_ds, ref_tail = fir.block_fir_decim(iq, hj, tail, decim,
                                          precision=lax.Precision.HIGHEST)
    ref_fm, ref_pi, ref_pq = demod.fm_demod_diff(
        iq_ds[..., 0, :], iq_ds[..., 1, :], pi, pq)

    fm, tail_f, pi_f, pq_f = frontend_pallas.fused_frontend_raw(
        blk, hj, tail, pi, pq, decim, mm_dtype=jnp.float32,
        interpret=True)
    power = np.asarray(iq_ds[..., 0, :] ** 2 + iq_ds[..., 1, :] ** 2)
    err = np.abs(np.asarray(fm) - np.asarray(ref_fm))
    assert err[power > 1e-3].max() < 1e-3
    np.testing.assert_array_equal(np.asarray(tail_f), np.asarray(ref_tail))
    np.testing.assert_allclose(np.asarray(pi_f), np.asarray(ref_pi),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pq_f), np.asarray(ref_pq),
                               atol=1e-5)


@pytest.mark.parametrize("mode", [0, 1])
def test_fused_frontend_raw_pm_matches_raw(mode):
    """Experimental plane-major raw kernel (i32-packed input, byte-plane
    extraction, permuted Hraw): interpreter-mode equivalence with the
    serving raw kernel — state legs exact, fm to fp32 tolerance
    (different accumulation order from the row permutation)."""
    cfg = get_mode(mode)
    rng = np.random.default_rng(6)
    c = 3
    params = receiver.make_params(cfg)
    h = params.rf_coeff
    tail = jnp.asarray(rng.standard_normal((c, 2, cfg.num_taps - 1))
                       .astype(np.float32) * 0.1)
    pi = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    pq = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    blk = jnp.asarray(rng.integers(0, 256, (c, cfg.block_size),
                                   dtype=np.uint8))
    a = frontend_pallas.fused_frontend_raw(
        blk, h, tail, pi, pq, cfg.rf_decim, mm_dtype=jnp.float32,
        interpret=True)
    b = frontend_pallas.fused_frontend_raw_pm(
        blk, h, tail, pi, pq, cfg.rf_decim, mm_dtype=jnp.float32,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a[3]), np.asarray(b[3]),
                               atol=1e-5)
    # fm: compare where the demod's /power does not amplify fp noise
    x = (blk.astype(jnp.float32) - 128.0) / 128.0
    iq = jnp.moveaxis(x.reshape(c, -1, 2), -1, -2)
    iq_ds, _ = fir.block_fir_decim(iq, h, tail, cfg.rf_decim,
                                   precision=lax.Precision.HIGHEST)
    power = np.asarray(iq_ds[..., 0, :] ** 2 + iq_ds[..., 1, :] ** 2)
    err = np.abs(np.asarray(a[0]) - np.asarray(b[0]))
    assert err[power > 1e-3].max() < 1e-3


@pytest.mark.parametrize("variant", ["fused", "fused-rf", "fused-phase"])
def test_front_step_fused_flag_cpu_interpret(monkeypatch, variant):
    """front_step(frontend=...) wires the kernels correctly (state
    shapes, batch flattening) — interpreter mode via monkeypatch."""
    import functools
    monkeypatch.setattr(frontend_pallas, "fused_frontend",
                        functools.partial(frontend_pallas.fused_frontend,
                                          interpret=True))
    monkeypatch.setattr(
        frontend_pallas, "fused_frontend_raw",
        functools.partial(frontend_pallas.fused_frontend_raw,
                          interpret=True))
    monkeypatch.setattr(
        frontend_pallas, "fused_frontend_full",
        functools.partial(frontend_pallas.fused_frontend_full,
                          interpret=True))
    from dy4tpu.tx import fm as txfm
    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg, batch=(2,))
    # constant-envelope broadcast input: on pure noise the demod's
    # /power amplifies fp differences at near-zero-power samples
    base = txfm.synthesize(
        cfg, 1, left=txfm.tone(800.0, cfg.audio_fs, cfg.audio_per_block,
                               amp=0.7),
        right=txfm.tone(2400.0, cfg.audio_fs, cfg.audio_per_block,
                        amp=0.7))
    blk = jnp.broadcast_to(jnp.asarray(base.reshape(cfg.block_size)),
                           (2, cfg.block_size)) + jnp.uint8(0)
    fs = receiver.front_state_of(state)
    fs_stock, fo_stock = receiver.front_step(params, fs, blk, cfg,
                                             frontend="stock")
    fs_fused, fo_fused = receiver.front_step(params, fs, blk, cfg,
                                             frontend=variant,
                                             precision=lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(fo_fused.pilot),
                               np.asarray(fo_stock.pilot), atol=2e-4)
    np.testing.assert_allclose(np.asarray(fs_fused.rf.iq_tail),
                               np.asarray(fs_stock.rf.iq_tail), atol=1e-6)


def test_fused_geometry_gate():
    assert receiver.fused_frontend_ok(get_mode(0))
    assert receiver.fused_phase_frontend_ok(get_mode(0))
    # gates must answer (not crash) for every mode
    for m in (1, 2, 3):
        receiver.fused_frontend_ok(get_mode(m))
        receiver.fused_phase_frontend_ok(get_mode(m))


def _if_stream(mode, n_blocks, rds):
    """Complex IF-rate FM stream (what a channelizer channel carries):
    exp(j * 2pi kf/if_fs * cumsum(multiplex)), blocked."""
    from dy4tpu.rds import coding
    from dy4tpu.tx import fm as txfm
    c = get_mode(mode)
    n_audio = n_blocks * c.audio_per_block
    bits = (coding.make_ps_bitstream(0x1234, 5, "IF TEST!", repeats=4)
            if rds else None)
    m = txfm.multiplex(c, n_blocks,
                       left=txfm.tone(800.0, c.audio_fs, n_audio, amp=0.7),
                       right=txfm.tone(2400.0, c.audio_fs, n_audio,
                                       amp=0.7),
                       rds_bits=bits)
    phase = 2 * np.pi * 75e3 / c.if_fs * np.cumsum(m)
    x = np.exp(1j * phase)
    return (x.real.reshape(n_blocks, c.if_per_block).astype(np.float32),
            x.imag.reshape(n_blocks, c.if_per_block).astype(np.float32))


@pytest.mark.parametrize("mode,rds", [(0, True), (1, False)])
def test_fused_frontend_if_matches_stock_stream(mode, rds):
    """IF-entry kernel (demod -> delays/bank/squaring/carrier in one
    VMEM pass) vs the stock front_step_if composition over a 2-block
    stream, including state interchange (the kernel's new FrontState
    values must keep feeding the stock path)."""
    c = get_mode(mode)
    ch = 2
    params = receiver.make_params(c, with_rds=rds)
    n_blocks = 2
    bi, bq = _if_stream(mode, n_blocks, rds)
    st = receiver.init_state(c, batch=(ch,), with_rds=rds)
    fs = receiver.front_state_of(st)
    for it in range(n_blocks):
        i_if = jnp.broadcast_to(jnp.asarray(bi[it]), (ch, c.if_per_block))
        q_if = jnp.broadcast_to(jnp.asarray(bq[it]), (ch, c.if_per_block))
        fs_ref, fo_ref = receiver.front_step_if(params, fs, i_if, q_if,
                                                c, frontend="stock",
                                                rds_enabled=rds)
        r = frontend_pallas.fused_frontend_if(
            i_if, q_if, fs.rf.prev_i, fs.rf.prev_q, params.bank_coeff,
            params.rds_carrier_coeff, fs.bank_tail, fs.mono_delay,
            fs.carrier_tail, fs.rds_delay, rds=rds,
            mm_dtype=jnp.float32, interpret=True)
        (fmd, pilot, stereo, carrier, rdsdel, npi, npq, nbank, nmono,
         ncar, nrds) = r
        checks = [(fmd, fo_ref.fm_delayed, 2e-3),
                  (pilot, fo_ref.pilot, 1e-4),
                  (stereo, fo_ref.stereo_band, 5e-4),
                  (nbank, fs_ref.bank_tail, 2e-3),
                  (nmono, fs_ref.mono_delay, 2e-3),
                  (npi, fs_ref.rf.prev_i, 1e-5),
                  (npq, fs_ref.rf.prev_q, 1e-5)]
        if rds:
            checks += [(carrier, fo_ref.carrier, 1e-5),
                       (rdsdel, fo_ref.rds_delayed, 1e-4),
                       (ncar, fs_ref.carrier_tail, 1e-3),
                       (nrds, fs_ref.rds_delay, 1e-4)]
        else:
            assert carrier is None and rdsdel is None
            assert ncar is None and nrds is None
        for a, b, tol in checks:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=max(tol, 1e-12))
        fs = fs_ref


def test_front_step_if_fused_flag_cpu_interpret(monkeypatch):
    """front_step_if(frontend='fused') wires the kernel correctly
    (batch flattening, untouched iq_tail slot, odd channel padding)."""
    import functools
    monkeypatch.setattr(
        frontend_pallas, "fused_frontend_if",
        functools.partial(frontend_pallas.fused_frontend_if,
                          interpret=True))
    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg, batch=(3,))   # odd: exercises c_pad
    bi, bq = _if_stream(0, 1, True)
    i_if = jnp.broadcast_to(jnp.asarray(bi[0]), (3, cfg.if_per_block))
    q_if = jnp.broadcast_to(jnp.asarray(bq[0]), (3, cfg.if_per_block))
    fs = receiver.front_state_of(state)
    fs_stock, fo_stock = receiver.front_step_if(params, fs, i_if, q_if,
                                                cfg, frontend="stock")
    fs_fused, fo_fused = receiver.front_step_if(
        params, fs, i_if, q_if, cfg, frontend="fused",
        precision=lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(fo_fused.pilot),
                               np.asarray(fo_stock.pilot), atol=2e-4)
    np.testing.assert_allclose(np.asarray(fo_fused.carrier),
                               np.asarray(fo_stock.carrier), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(fs_fused.rf.iq_tail),
                                  np.asarray(fs_stock.rf.iq_tail))


def test_fused_if_geometry_gate():
    for m in (0, 1, 2, 3):
        receiver.fused_if_frontend_ok(get_mode(m))


@pytest.mark.parametrize("split", [2, 3])
def test_fused_frontend_raw_split_bit_identical(split):
    """The split-J window-build/dot interleave (round-4 overlap probe,
    benchmarks/micro_front_split.py) is bit-identical to the monolithic
    kernel — the dot slabs are the same rows in the same order."""
    rng = np.random.default_rng(11)
    k, decim = 101, 10
    n_out = 6 * frontend_pallas._T
    bs = 2 * n_out * decim
    from dy4tpu.ops import firdes
    h = jnp.asarray(firdes.lpf(2.4e6, 100e3, k), jnp.float32)
    iq = jnp.asarray(rng.integers(0, 256, (4, bs), dtype=np.uint8))
    tail = jnp.asarray(rng.standard_normal((4, 2, k - 1)), jnp.float32) * .1
    pv = jnp.asarray(rng.standard_normal(4), jnp.float32)
    base = frontend_pallas.fused_frontend_raw(iq, h, tail, pv, pv, decim,
                                              interpret=True)
    got = frontend_pallas.fused_frontend_raw(iq, h, tail, pv, pv, decim,
                                             split=split, interpret=True)
    for a, b in zip(base, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
