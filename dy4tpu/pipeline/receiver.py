"""The full per-block FM receiver as one pure jitted function.

Architecture (TPU-first, not a port): where the reference runs a
frontend/backend thread pair joined by a mutex queue per block
(``src/project.cpp:289-305``), here the *entire* receiver —
RF front end, mono path, stereo path, RDS DSP chain and clock/data
recovery — is a single pure function

    receiver_step(params, state, iq_u8) -> (state', outputs)

over a ``[channels, block]`` batch, with every piece of carried state
(SURVEY §2.4) reified in the ``ReceiverState`` pytree.  XLA fuses and
overlaps the former "threads"; scaling comes from batching channels and
sharding (see ``dy4tpu.parallel``), not from host threads.

Signal flow equals the reference dataflow (spec Fig.2/Fig.22; C++
``frontend``/``backend`` project.cpp:72-134; Python RDS chain
fmMonoBlock.py:611-730).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from dy4tpu.config import ModeConfig
from dy4tpu.ops import demod, fir, firdes, iqcorr, mix, pll

Array = jax.Array


class ReceiverParams(NamedTuple):
    """Filter coefficient tables (computed once per mode)."""
    rf_coeff: Array        # [taps] RF LPF 100 kHz (project.cpp:262)
    audio_coeff: Array     # [taps*U] audio LPF 16 kHz, gain*U (project.cpp:265)
    bank_coeff: Array      # [F, taps] band filters over fm_demod:
    #                        row 0 pilot 18.5-19.5k, row 1 stereo 22-54k,
    #                        row 2 RDS band 54-60k (when enabled)
    rds_carrier_coeff: Optional[Array]  # [taps] 113.5-114.5 kHz
    rds_lpf_coeff: Optional[Array]      # [taps*U_rds] 3 kHz, gain*U_rds
    rds_rrc_coeff: Optional[Array]      # [taps] RRC at rds_fs


class RFState(NamedTuple):
    iq_tail: Array         # [..., 2, taps-1] I/Q LPF overlap-save tails
    prev_i: Array          # [...]
    prev_q: Array          # [...]


class AudioState(NamedTuple):
    mono_delay: Array      # [..., taps//2] all-pass delay line
    mono_tail: Array       # [..., (taps*U-1)//U] mono resampler tail
    bank_tail: Array       # [..., taps-1] ONE shared band-bank history:
    #                        pilot/stereo/RDS-band all filter the same fm
    #                        stream, so its last taps-1 samples serve
    #                        every row (the state encodes the invariant
    #                        the fused kernel relies on)
    stereo_tail: Array     # [..., (taps*U-1)//U] post-mix resampler tail
    pll: pll.PLLState      # stereo pilot PLL


class CDRState(NamedTuple):
    """Clock/data recovery carry (fmSupportLib.py:209-247)."""
    offset: Array          # [...] int32, sampling phase in [0, sps)
    found: Array           # [...] bool, timing lock flag


class RDSState(NamedTuple):
    carrier_tail: Array    # [..., taps-1]
    delay: Array           # [..., taps//2]
    lpf_tail_i: Array      # [..., (taps*U_rds-1)//U_rds]
    lpf_tail_q: Array
    rrc_tail_i: Array      # [..., taps-1]
    rrc_tail_q: Array
    pll: pll.PLLState
    cdr: CDRState


class ReceiverState(NamedTuple):
    rf: RFState
    audio: AudioState
    rds: Optional[RDSState]
    iqcorr: Optional[iqcorr.IQCorrState] = None
    #   opt-in blind DC/IQ-imbalance tracker (ops/iqcorr.py).  Cross-
    #   block feedback like the AFC loop: incompatible with the exact
    #   time-sharded replay (parallel/sharded.py rejects it).


class StepOutputs(NamedTuple):
    mono: Array            # [..., audio_per_block] float32
    left: Array            # [..., audio_per_block]
    right: Array           # [..., audio_per_block]
    rds_bb_i: Optional[Array]   # [..., rds_per_block] post-RRC in-phase
    rds_bb_q: Optional[Array]
    rds_symbols: Optional[Array]  # [..., symbols_per_block] int8 hard bits
    rds_sym_i: Optional[Array]    # sampled I at symbol instants (soft)
    rds_resync: Optional[Array]   # [...] bool — CDR re-acquired this block
    rds_offset: Optional[Array]   # [...] int32 — CDR sampling phase used;
    #                               consumers should reset their bit/frame
    #                               state only when this CHANGES (a resync
    #                               that re-finds the same phase keeps the
    #                               symbol stream continuous)
    pilot_snr_db: Array = None    # [...] pilot-lock SNR estimate (dB) —
    #                               drives the opt-in weak-signal stereo
    #                               blend (ops/mix.py stereo_blend)


class FrontState(NamedTuple):
    """Carried state of the LTI front half (everything before the PLLs).

    Every field is an *input window* of its stage's stream (overlap-save
    tails / delay lines), so it is reproduced exactly by replaying enough
    of the raw input — the property the exact time-sharded receiver's
    halo warm-up relies on (dy4tpu/parallel/sharded.py).
    """
    rf: RFState
    mono_delay: Array
    bank_tail: Array
    carrier_tail: Optional[Array]
    rds_delay: Optional[Array]


class FrontOut(NamedTuple):
    """Per-block LTI signals feeding the PLLs and the back half."""
    fm_delayed: Array          # [..., if_per_block]
    pilot: Array               # [..., if_per_block] — stereo PLL input
    stereo_band: Array
    carrier: Optional[Array]   # RDS carrier BPF output — RDS PLL input
    rds_delayed: Optional[Array]


class BackState(NamedTuple):
    """Carried state of the post-PLL half — again all input windows, but
    of NCO-mixed streams, so exact reproduction additionally needs the
    exact NCO over the replay window."""
    mono_tail: Array
    stereo_tail: Array
    lpf_tail_i: Optional[Array]
    lpf_tail_q: Optional[Array]
    rrc_tail_i: Optional[Array]
    rrc_tail_q: Optional[Array]


class BackOut(NamedTuple):
    mono: Array
    left: Array
    right: Array
    bb_i: Optional[Array]      # post-RRC baseband (CDR input)
    bb_q: Optional[Array]


def _rds_on(cfg: ModeConfig, with_rds) -> bool:
    return cfg.supports_rds if with_rds is None else (
        bool(with_rds) and cfg.supports_rds)


def front_state_of(state: ReceiverState) -> FrontState:
    rds = state.rds
    return FrontState(rf=state.rf, mono_delay=state.audio.mono_delay,
                      bank_tail=state.audio.bank_tail,
                      carrier_tail=None if rds is None else rds.carrier_tail,
                      rds_delay=None if rds is None else rds.delay)


def back_state_of(state: ReceiverState) -> BackState:
    rds = state.rds
    return BackState(
        mono_tail=state.audio.mono_tail,
        stereo_tail=state.audio.stereo_tail,
        lpf_tail_i=None if rds is None else rds.lpf_tail_i,
        lpf_tail_q=None if rds is None else rds.lpf_tail_q,
        rrc_tail_i=None if rds is None else rds.rrc_tail_i,
        rrc_tail_q=None if rds is None else rds.rrc_tail_q)


def fused_frontend_ok(cfg: ModeConfig) -> bool:
    """Geometry gate for the fused Pallas front ends (128-lane output
    tiles; history slab within one tile stride; the full-front kernel's
    band-filter history must additionally fit one 128-lane tile)."""
    return (cfg.if_per_block % 128 == 0
            and 2 * (cfg.num_taps - 1) <= 2 * 128 * cfg.rf_decim
            and cfg.num_taps - 1 <= 128)


def fused_phase_frontend_ok(cfg: ModeConfig) -> bool:
    """Extra gate for the phase-split kernel variant (kept for A/B):
    tap count must additionally phase-align to the decimation."""
    return fused_frontend_ok(cfg) and (cfg.num_taps - 1) % cfg.rf_decim == 0


def front_step(params: ReceiverParams, fstate: FrontState, iq_u8: Array,
               cfg: ModeConfig, *, precision=jax.lax.Precision.HIGHEST,
               rds_enabled: bool = True, frontend: str = "auto",
               demod_kind: str = "diff",
               corr: Optional[iqcorr.IQCorrCoeffs] = None,
               corr_moments: bool = False):
    """RF front end + band bank + RDS carrier recovery filters — the LTI
    half of the receiver (project.cpp:72-93 + fmMonoBlock.py:673-680).

    ``frontend``: "stock" (normalize + FIR + demod + delays/bank/carrier
    as XLA ops), "fused" (the WHOLE front half as one Pallas VMEM pass —
    raw u8 -> fm via the tap-parity banded matmul, then mono delay,
    band bank, squaring, carrier BPF and RDS delay as decim-1 Toeplitz
    dots on the in-VMEM streams; ops/frontend_pallas.py), "fused-rf"
    (raw u8->fm kernel only, XLA for the rest — A/B), "fused-phase"
    (the earlier phase-pre-split kernel — A/B), or "auto" (fused on TPU
    when the mode geometry fits).

    ``corr``/``corr_moments``: opt-in IQ correction (ops/iqcorr.py) —
    ``corr`` applies the given coefficients to the decimated I/Q
    before the demod (in-VMEM in the fused kernel; ``iqcorr.apply``
    on the stock path); ``corr_moments=True`` additionally returns the
    PRE-correction conic-fit moments as a third element
    ``(fstate, fo, mom[..., 14])``, in the stock ``i_ds`` units both
    paths share (the kernel emits its 128x-scaled streams as /128).

    ``demod_kind``: "diff" (the differentiator the reference runs in real
    time, src/filter.cpp:85-102 — the production path) or "arctan" (the
    phase-unwrap demod of the reference *Python model*'s chain,
    fmMonoBlock.py:628 with il_vs_th=1; stock frontend only).  The two
    differ by ~25 dB on a full-deviation broadcast (sin(dphi) vs dphi at
    phase steps up to ~3 rad) — that discrepancy is internal to the
    reference itself, and "arctan" exists so the full-chain golden test
    can pin our chain against the executed model without it
    (tests/test_golden_chain.py).  With "arctan" the RFState.prev_i slot
    carries the previous block's phase and prev_q the last Q sample.
    """
    bs = iq_u8.shape[-1]
    # normally one block; the exact time-sharded receiver also feeds
    # sub-block warm-up minis (parallel/sharded.py exact_min_halo_if) —
    # any length whose IF output is 128-lane aligned is legal here
    assert bs == cfg.block_size or (
        bs % (2 * cfg.rf_decim * 128) == 0), (iq_u8.shape, cfg.block_size)
    if demod_kind == "arctan":
        if frontend not in ("auto", "stock"):
            raise ValueError("demod_kind='arctan' requires the stock "
                             f"frontend, got {frontend!r}")
        frontend = "stock"
    if frontend == "auto":
        import os
        env = os.environ.get("DY4TPU_FRONTEND", "auto")
        if env in ("stock", "fused", "fused-rf", "fused-phase"):
            frontend = env
        else:
            frontend = ("fused" if jax.default_backend() == "tpu"
                        and fused_frontend_ok(cfg) else "stock")

    # explicit (or env-forced) fused variants must fail loudly on
    # unsupported geometry, not die inside the kernel's asserts
    if frontend in ("fused", "fused-rf") and not fused_frontend_ok(cfg):
        raise ValueError(f"frontend={frontend!r} unsupported for this "
                         f"mode geometry (taps={cfg.num_taps}, "
                         f"decim={cfg.rf_decim}, "
                         f"if_per_block={cfg.if_per_block}); use 'stock'")
    if frontend == "fused-phase" and not fused_phase_frontend_ok(cfg):
        raise ValueError("frontend='fused-phase' needs phase-aligned "
                         f"taps ((taps-1) % decim == 0; taps="
                         f"{cfg.num_taps}, decim={cfg.rf_decim})")
    if corr is not None and frontend in ("fused-rf", "fused-phase"):
        # the A/B experimental kernels stop at the fm stream and expose
        # no pre-demod I/Q point; only stock + the serving 'fused' path
        # carry the correction epilogue
        raise ValueError(f"IQ correction unsupported with frontend="
                         f"{frontend!r}; use 'fused' or 'stock'")
    if corr_moments and corr is None:
        raise ValueError("corr_moments=True requires corr (the fused "
                         "kernel emits moments with its correction "
                         "epilogue)")

    if frontend == "fused":
        # whole LTI front half in ONE Pallas pass: raw u8 -> fm -> mono
        # delay + band bank + squaring + carrier BPF + RDS delay — the
        # fm and squared streams never round-trip HBM
        from dy4tpu.ops import frontend_pallas
        mm = (jnp.float32 if precision == jax.lax.Precision.HIGHEST
              else jnp.bfloat16)
        batch = iq_u8.shape[:-1]
        flat = lambda a: (None if a is None else  # noqa: E731
                          a.reshape((-1,) + a.shape[len(batch):]))
        unflat = lambda a: (None if a is None else  # noqa: E731
                            a.reshape(batch + a.shape[1:]))
        corr_arr = (None if corr is None else
                    jnp.stack([corr.dc_i.reshape(-1),
                               corr.dc_q.reshape(-1),
                               corr.rho.reshape(-1),
                               corr.s.reshape(-1)], axis=-1))
        (fmd, pilot, stereo, carrier, rds_delayed, iq_tail, prev_i,
         prev_q, bank_tail, mono_delay, carrier_tail, rds_delay,
         mom) = (
            frontend_pallas.fused_frontend_full(
                iq_u8.reshape(-1, bs), params.rf_coeff,
                params.bank_coeff, params.rds_carrier_coeff,
                flat(fstate.rf.iq_tail), flat(fstate.rf.prev_i),
                flat(fstate.rf.prev_q), flat(fstate.bank_tail),
                flat(fstate.mono_delay), flat(fstate.carrier_tail),
                flat(fstate.rds_delay), cfg.rf_decim,
                rds=rds_enabled, mm_dtype=mm, corr=corr_arr))
        ret = (FrontState(
                   rf=RFState(iq_tail=unflat(iq_tail),
                              prev_i=prev_i.reshape(batch),
                              prev_q=prev_q.reshape(batch)),
                   mono_delay=unflat(mono_delay),
                   bank_tail=unflat(bank_tail),
                   carrier_tail=unflat(carrier_tail),
                   rds_delay=unflat(rds_delay)),
               FrontOut(fm_delayed=unflat(fmd), pilot=unflat(pilot),
                        stereo_band=unflat(stereo),
                        carrier=unflat(carrier),
                        rds_delayed=unflat(rds_delayed)))
        if corr_moments:
            return (*ret, mom.reshape(*batch, mom.shape[-1]))
        return ret

    if frontend in ("fused-rf", "fused-phase"):
        from dy4tpu.ops import frontend_pallas
        kern = (frontend_pallas.fused_frontend_raw
                if frontend == "fused-rf" else
                frontend_pallas.fused_frontend)
        mm = (jnp.float32 if precision == jax.lax.Precision.HIGHEST
              else jnp.bfloat16)
        batch = iq_u8.shape[:-1]
        fm, iq_tail, prev_i, prev_q = kern(
            iq_u8.reshape(-1, bs), params.rf_coeff,
            fstate.rf.iq_tail.reshape((-1,) + fstate.rf.iq_tail.shape[len(batch):]),
            fstate.rf.prev_i.reshape(-1), fstate.rf.prev_q.reshape(-1),
            cfg.rf_decim, mm_dtype=mm)
        fm = fm.reshape((*batch, -1))
        iq_tail = iq_tail.reshape((*batch, *iq_tail.shape[1:]))
        prev_i = prev_i.reshape(batch)
        prev_q = prev_q.reshape(batch)
    else:
        x = (iq_u8.astype(jnp.float32) - 128.0) / 128.0
        iq = x.reshape((*x.shape[:-1], bs // 2, 2))
        iq = jnp.moveaxis(iq, -1, -2)  # [..., 2, N] : I row 0, Q row 1

        # ---- RF front end (project.cpp:72-93) ----
        iq_ds, iq_tail = fir.block_fir_decim(iq, params.rf_coeff,
                                             fstate.rf.iq_tail,
                                             cfg.rf_decim,
                                             precision=precision)
        i_ds, q_ds = iq_ds[..., 0, :], iq_ds[..., 1, :]
        if corr_moments:
            mom = iqcorr.moments(i_ds, q_ds)   # PRE-correction, IF rate
        if corr is not None:
            # estimation and application share the i_ds units, so the
            # DC needs no filter-gain rescale (iqcorr.moments docstring)
            i_ds, q_ds = iqcorr.apply(i_ds, q_ds, corr)
        if demod_kind == "arctan":
            # prev_i slot carries the previous block's phase (init 0
            # matches the model's state_phase=0, fmMonoBlock.py:594)
            fm, phase = demod.fm_demod_arctan(i_ds, q_ds, fstate.rf.prev_i)
            prev_i, prev_q = phase, q_ds[..., -1]
        else:
            fm, prev_i, prev_q = demod.fm_demod_diff(i_ds, q_ds,
                                                     fstate.rf.prev_i,
                                                     fstate.rf.prev_q)
    new_rf = RFState(iq_tail=iq_tail, prev_i=prev_i, prev_q=prev_q)
    ret = _front_post_demod(params, fstate, fm, new_rf, precision,
                            rds_enabled)
    if corr_moments:
        return (*ret, mom)
    return ret


def _front_post_demod(params: ReceiverParams, fstate: FrontState,
                      fm: Array, new_rf: RFState, precision,
                      rds_enabled: bool) -> tuple[FrontState, FrontOut]:
    """Everything between the FM demod output and the PLLs (shared by
    the RF-entry stock/fused-rf/fused-phase paths and the IF-entry
    channelizer path)."""
    # ---- mono path delay (project.cpp:109-116) ----
    fm_delayed, mono_delay = mix.delay_block(fm, fstate.mono_delay)

    # ---- band filter bank over fm_demod (one fused conv) ----
    bands, bank_tail = fir.block_fir_bank(fm, params.bank_coeff,
                                          fstate.bank_tail,
                                          precision=precision)
    pilot = bands[..., 0, :]
    stereo_band = bands[..., 1, :]

    carrier = rds_delayed = carrier_tail = rds_delay = None
    if rds_enabled:
        rds_band = bands[..., 2, :]
        squared = mix.squaring_nonlinearity(rds_band)
        carrier, carrier_tail = fir.block_fir(
            squared, params.rds_carrier_coeff, fstate.carrier_tail,
            precision=precision)
        rds_delayed, rds_delay = mix.delay_block(rds_band, fstate.rds_delay)

    return (FrontState(rf=new_rf, mono_delay=mono_delay,
                       bank_tail=bank_tail, carrier_tail=carrier_tail,
                       rds_delay=rds_delay),
            FrontOut(fm_delayed=fm_delayed, pilot=pilot,
                     stereo_band=stereo_band, carrier=carrier,
                     rds_delayed=rds_delayed))


def fused_if_frontend_ok(cfg: ModeConfig) -> bool:
    """Geometry gate for the fused IF-entry front kernel: 128-lane
    output tiles and the band-filter history within one lane tile."""
    return cfg.if_per_block % 128 == 0 and cfg.num_taps - 1 <= 128


def front_step_if(params: ReceiverParams, fstate: FrontState,
                  i_if: Array, q_if: Array, cfg: ModeConfig, *,
                  precision=jax.lax.Precision.HIGHEST,
                  rds_enabled: bool = True, frontend: str = "auto"
                  ) -> tuple[FrontState, FrontOut]:
    """IF-entry front half: consume per-channel complex baseband at the
    IF rate (e.g. from ``ops/channelizer.py``) instead of raw RF u8.

    Skips the RF LPF + decimation (a DFT-filter-bank channelizer has
    already band-limited and decimated each channel); FM demod onward is
    identical to ``front_step``.  ``i_if``/``q_if``: [..., if_per_block].
    The RF ``iq_tail`` slot is carried through untouched so the state
    pytree stays interchangeable with the RF-entry receiver's.

    ``frontend``: "stock" (XLA ops), "fused" (demod + mono delay + band
    bank + squaring + carrier BPF + RDS delay in ONE Pallas VMEM pass,
    `ops/frontend_pallas.fused_frontend_if`), or "auto" (fused on TPU
    when the geometry fits; also honours ``DY4TPU_FRONTEND=stock``).
    """
    if frontend == "auto":
        import os
        env = os.environ.get("DY4TPU_FRONTEND", "auto")
        if env == "stock":
            frontend = "stock"
        else:
            frontend = ("fused" if jax.default_backend() == "tpu"
                        and fused_if_frontend_ok(cfg) else "stock")
    if frontend == "fused" and not fused_if_frontend_ok(cfg):
        raise ValueError("frontend='fused' unsupported for this mode "
                         f"geometry (taps={cfg.num_taps}, "
                         f"if_per_block={cfg.if_per_block}); use 'stock'")

    if frontend == "fused":
        from dy4tpu.ops import frontend_pallas
        mm = (jnp.float32 if precision == jax.lax.Precision.HIGHEST
              else jnp.bfloat16)
        batch = i_if.shape[:-1]
        n_if = i_if.shape[-1]
        flat = lambda a: (None if a is None else  # noqa: E731
                          a.reshape((-1,) + a.shape[len(batch):]))
        unflat = lambda a: (None if a is None else  # noqa: E731
                            a.reshape(batch + a.shape[1:]))
        (fmd, pilot, stereo, carrier, rds_delayed, prev_i, prev_q,
         bank_tail, mono_delay, carrier_tail, rds_delay) = (
            frontend_pallas.fused_frontend_if(
                i_if.reshape(-1, n_if), q_if.reshape(-1, n_if),
                flat(fstate.rf.prev_i).reshape(-1),
                flat(fstate.rf.prev_q).reshape(-1),
                params.bank_coeff, params.rds_carrier_coeff,
                flat(fstate.bank_tail), flat(fstate.mono_delay),
                flat(fstate.carrier_tail), flat(fstate.rds_delay),
                rds=rds_enabled, mm_dtype=mm))
        return (FrontState(
                    rf=RFState(iq_tail=fstate.rf.iq_tail,
                               prev_i=prev_i.reshape(batch),
                               prev_q=prev_q.reshape(batch)),
                    mono_delay=unflat(mono_delay),
                    bank_tail=unflat(bank_tail),
                    carrier_tail=unflat(carrier_tail),
                    rds_delay=unflat(rds_delay)),
                FrontOut(fm_delayed=unflat(fmd), pilot=unflat(pilot),
                         stereo_band=unflat(stereo),
                         carrier=unflat(carrier),
                         rds_delayed=unflat(rds_delayed)))

    fm, prev_i, prev_q = demod.fm_demod_diff(i_if, q_if,
                                             fstate.rf.prev_i,
                                             fstate.rf.prev_q)
    new_rf = RFState(iq_tail=fstate.rf.iq_tail, prev_i=prev_i,
                     prev_q=prev_q)
    return _front_post_demod(params, fstate, fm, new_rf, precision,
                             rds_enabled)


def fused_backend_ok(cfg: ModeConfig) -> bool:
    """Geometry gate for the fused audio back end: the U=1 kernel
    (ops/backend_pallas.py) or its rational-U twin
    (ops/resample_pallas.py, modes 2/3)."""
    from dy4tpu.ops import backend_pallas, resample_pallas
    return (backend_pallas.fused_backend_ok(
                cfg.if_per_block, cfg.audio_up, cfg.audio_taps,
                cfg.audio_per_block)
            or resample_pallas.fused_rational_ok(
                cfg.audio_up, cfg.audio_taps, cfg.if_per_block))


def fused_rds_backend_ok(cfg: ModeConfig) -> bool:
    """Geometry gate for the fused RDS back end (quadrature mix ->
    rational resampler -> RRC, ops/resample_pallas.py)."""
    if not cfg.supports_rds:
        return False
    from dy4tpu.ops import resample_pallas
    return resample_pallas.fused_rds_backend_ok(
        cfg.rds_up, cfg.rds_taps, cfg.rds_rrc_taps, cfg.if_per_block,
        cfg.rds_per_block)


def back_step(params: ReceiverParams, bstate: BackState, fo: FrontOut,
              nco: Array, nco_i: Optional[Array], nco_q: Optional[Array],
              cfg: ModeConfig, *, precision=jax.lax.Precision.HIGHEST,
              rds_enabled: bool = True, backend: str = "auto"
              ) -> tuple[BackState, BackOut]:
    """Audio resampling + stereo matrix + RDS matched filtering — the
    post-PLL half (project.cpp:118-133; fmMonoBlock.py:684-696).  ``nco``
    is the stereo pilot NCO; ``nco_i``/``nco_q`` the RDS quadrature NCO
    pair (None when RDS is off).

    ``backend``: "stock" (XLA mix + stacked resampler + matrix),
    "fused" (one Pallas VMEM pass — ops/backend_pallas.py for the U=1
    modes, ops/resample_pallas.py per-tile banded matrices for the
    rational U=147 modes), or "auto" (fused on TPU when the geometry
    fits; env DY4TPU_BACKEND overrides).  The RDS leg has its own knob:
    DY4TPU_RDS_BACKEND = stock | fused | auto (default auto — the fused
    quadrature-mix -> resampler -> RRC pass on TPU)."""
    if backend == "auto":
        import os
        env = os.environ.get("DY4TPU_BACKEND", "auto")
        if env in ("stock", "fused"):
            backend = env
        else:
            backend = ("fused" if jax.default_backend() == "tpu"
                       and fused_backend_ok(cfg) else "stock")

    if backend == "fused":
        if not fused_backend_ok(cfg):
            raise ValueError(
                f"backend='fused' requires audio resampler state "
                f"(taps-1)//U <= 128 and (for U=1) 128-divisible block "
                f"geometry (mode has U={cfg.audio_up}, "
                f"taps={cfg.audio_taps}); use backend='stock'")
        from dy4tpu.ops import backend_pallas, resample_pallas
        mm = (jnp.float32 if precision == jax.lax.Precision.HIGHEST
              else jnp.bfloat16)
        batch = fo.fm_delayed.shape[:-1]
        flat = lambda a: a.reshape((-1,) + a.shape[len(batch):])  # noqa: E731
        unflat = lambda a: a.reshape(batch + a.shape[1:])  # noqa: E731
        if cfg.audio_up == 1:
            mono, left, right, mono_tail, stereo_tail = (
                backend_pallas.fused_audio_backend(
                    flat(fo.fm_delayed), flat(fo.stereo_band), flat(nco),
                    params.audio_coeff, flat(bstate.mono_tail),
                    flat(bstate.stereo_tail), cfg.audio_down, mm_dtype=mm))
        else:
            mono, left, right, mono_tail, stereo_tail = (
                resample_pallas.fused_audio_backend_rational(
                    flat(fo.fm_delayed), flat(fo.stereo_band), flat(nco),
                    params.audio_coeff, flat(bstate.mono_tail),
                    flat(bstate.stereo_tail), cfg.audio_up,
                    cfg.audio_down, mm_dtype=mm))
        mono, left, right = unflat(mono), unflat(left), unflat(right)
        mono_tail = unflat(mono_tail)
        stereo_tail = unflat(stereo_tail)
    else:
        # ---- mono + stereo audio resamplers, one stacked call ----
        stereo_mixed = mix.mix(nco, fo.stereo_band, gain=2.0)
        audio_in = jnp.stack([fo.fm_delayed, stereo_mixed], axis=-2)
        audio_tails = jnp.stack([bstate.mono_tail, bstate.stereo_tail],
                                axis=-2)
        audio_out, audio_tails = fir.block_fir_resample(
            audio_in, params.audio_coeff, audio_tails,
            up=cfg.audio_up, down=cfg.audio_down, precision=precision)
        mono, stereo_lp = audio_out[..., 0, :], audio_out[..., 1, :]
        mono_tail = audio_tails[..., 0, :]
        stereo_tail = audio_tails[..., 1, :]
        left, right = mix.stereo_matrix(mono, stereo_lp)

    bb_i = bb_q = None
    lpf_tail_i = lpf_tail_q = rrc_tail_i = rrc_tail_q = None
    if rds_enabled:
        import os
        rds_backend = os.environ.get("DY4TPU_RDS_BACKEND", "auto")
        if rds_backend == "auto":
            rds_backend = ("fused" if jax.default_backend() == "tpu"
                           and fused_rds_backend_ok(cfg) else "stock")
        if rds_backend == "fused":
            # quadrature mix + U/D resampler + RRC in one Pallas pass:
            # the mixed and resampled streams never round-trip HBM
            from dy4tpu.ops import resample_pallas
            mm = (jnp.float32 if precision == jax.lax.Precision.HIGHEST
                  else jnp.bfloat16)
            batch = fo.rds_delayed.shape[:-1]
            flat = lambda a: a.reshape(  # noqa: E731
                (-1,) + a.shape[len(batch):])
            unflat = lambda a: a.reshape(batch + a.shape[1:])  # noqa: E731
            (bb_i, bb_q, lpf_tail_i, lpf_tail_q, rrc_tail_i,
             rrc_tail_q) = (unflat(o) for o in
                            resample_pallas.fused_rds_backend(
                flat(fo.rds_delayed), flat(nco_i), flat(nco_q),
                params.rds_lpf_coeff, params.rds_rrc_coeff,
                flat(bstate.lpf_tail_i), flat(bstate.lpf_tail_q),
                flat(bstate.rrc_tail_i), flat(bstate.rrc_tail_q),
                cfg.rds_up, cfg.rds_down, mm_dtype=mm))
        else:
            # I and Q legs ride a stacked lane through one resampler and
            # one RRC call (the FIR ops are batched over leading dims)
            mixed = jnp.stack([mix.mix(nco_i, fo.rds_delayed, gain=1.0),
                               mix.mix(nco_q, fo.rds_delayed, gain=1.0)],
                              axis=-2)
            lpf_tails = jnp.stack([bstate.lpf_tail_i, bstate.lpf_tail_q],
                                  axis=-2)
            lp, lpf_tails = fir.block_fir_resample(
                mixed, params.rds_lpf_coeff, lpf_tails,
                up=cfg.rds_up, down=cfg.rds_down, precision=precision)
            rrc_tails = jnp.stack([bstate.rrc_tail_i, bstate.rrc_tail_q],
                                  axis=-2)
            bb, rrc_tails = fir.block_fir(lp, params.rds_rrc_coeff,
                                          rrc_tails, precision=precision)
            bb_i, bb_q = bb[..., 0, :], bb[..., 1, :]
            lpf_tail_i = lpf_tails[..., 0, :]
            lpf_tail_q = lpf_tails[..., 1, :]
            rrc_tail_i = rrc_tails[..., 0, :]
            rrc_tail_q = rrc_tails[..., 1, :]

    return (BackState(mono_tail=mono_tail, stereo_tail=stereo_tail,
                      lpf_tail_i=lpf_tail_i, lpf_tail_q=lpf_tail_q,
                      rrc_tail_i=rrc_tail_i, rrc_tail_q=rrc_tail_q),
            BackOut(mono=mono, left=left, right=right, bb_i=bb_i,
                    bb_q=bb_q))


def make_params(cfg: ModeConfig, with_rds: Optional[bool] = None,
                audio_filter: str = "reference") -> ReceiverParams:
    """Design all filters for a mode (host-side, run once).

    ``with_rds=False`` omits the RDS filters (and must be matched by the
    same flag in ``init_state``/``receiver_step``).

    ``audio_filter``: "reference" (default — the reference's Hann
    windowed-sinc, src/filter.cpp:14-29) or "kaiser" (beyond-parity:
    same geometry, ~30 dB more alias rejection; PARITY.md "Deliberate
    deviations")."""
    if_fs = cfg.if_fs
    rf = firdes.lpf(cfg.rf_fs, cfg.rf_fc, cfg.num_taps)
    audio_design = {"reference": firdes.lpf,
                    "kaiser": firdes.lpf_kaiser}[audio_filter]
    audio = audio_design(if_fs * cfg.audio_up, cfg.audio_fc, cfg.audio_taps,
                         up_factor=cfg.audio_up)
    bank = [firdes.bpf(if_fs, cfg.pilot_fb, cfg.pilot_fe, cfg.num_taps),
            firdes.bpf(if_fs, cfg.stereo_fb, cfg.stereo_fe, cfg.num_taps)]
    carrier = rds_lpf = rrc = None
    if _rds_on(cfg, with_rds):
        bank.append(firdes.bpf(if_fs, cfg.rds_fb, cfg.rds_fe, cfg.num_taps))
        carrier = jnp.asarray(firdes.bpf(if_fs, cfg.rds_carrier_fb,
                                         cfg.rds_carrier_fe, cfg.num_taps))
        rds_lpf = jnp.asarray(firdes.lpf(if_fs * cfg.rds_up, cfg.rds_fc,
                                         cfg.rds_taps, up_factor=cfg.rds_up))
        rrc = jnp.asarray(firdes.rrc(cfg.rds_fs, cfg.rds_rrc_taps,
                                     cfg.rds_symbol_rate))
    return ReceiverParams(
        rf_coeff=jnp.asarray(rf),
        audio_coeff=jnp.asarray(audio),
        bank_coeff=jnp.asarray(np.stack(bank)),
        rds_carrier_coeff=carrier,
        rds_lpf_coeff=rds_lpf,
        rds_rrc_coeff=rrc,
    )


def init_state(cfg: ModeConfig, batch: tuple[int, ...] = (),
               dtype=jnp.float32,
               with_rds: Optional[bool] = None,
               with_iqcorr: bool = False) -> ReceiverState:
    t = cfg.num_taps
    z = lambda *s: jnp.zeros((*batch, *s), dtype)  # noqa: E731
    rds_on = _rds_on(cfg, with_rds)
    audio_tail = fir.state_len(cfg.audio_taps, cfg.audio_up)
    rf = RFState(iq_tail=z(2, t - 1), prev_i=z(), prev_q=z())
    audio = AudioState(
        mono_delay=z(t // 2),
        mono_tail=z(audio_tail),
        bank_tail=z(t - 1),
        stereo_tail=z(audio_tail),
        pll=pll.init_state(batch, dtype),
    )
    rds = None
    if rds_on:
        rds = RDSState(
            carrier_tail=z(t - 1),
            delay=z(t // 2),
            lpf_tail_i=z(fir.state_len(cfg.rds_taps, cfg.rds_up)),
            lpf_tail_q=z(fir.state_len(cfg.rds_taps, cfg.rds_up)),
            rrc_tail_i=z(cfg.rds_rrc_taps - 1),
            rrc_tail_q=z(cfg.rds_rrc_taps - 1),
            pll=pll.init_state(batch, dtype),
            cdr=CDRState(offset=jnp.zeros(batch, jnp.int32),
                         found=jnp.zeros(batch, bool)),
        )
    return ReceiverState(
        rf=rf, audio=audio, rds=rds,
        iqcorr=iqcorr.init_iqcorr_state(batch, dtype)
        if with_iqcorr else None)


def _cdr(bb_i: Array, bb_q: Array, state: CDRState, sps: int,
         timing: str = "peak"
         ) -> tuple[Array, Array, Array, Array, CDRState]:
    """Clock/data recovery: pick a sampling phase when unlocked, then
    sample every ``sps``-th baseband sample.

    Static-shape redesign of ``manchesterEncoded``
    (fmSupportLib.py:209-247): the reference's searched offset may fall in
    [0, 2*sps) and it then drops one output ("truncate"); here the offset is
    reduced mod sps so every block yields exactly ``len/sps`` symbols, and a
    ``resync`` flag tells the decoder to reset its pairing vote.  The
    amplitude sanity check (< 0.05 on the last two samples -> re-acquire,
    fmSupportLib.py:235-238) is kept.

    ``timing`` selects the acquisition estimator:
    - "peak" (reference parity): strongest |I| sample in the first
      2*sps (two symbols of evidence — one noise spike mislocks it).
    - "envelope" (opt-in, `DY4TPU_CDR=envelope`): square-law spectral
      timing (Oerder & Meyr): the RRC-shaped baseband's envelope
      i^2+q^2 has a spectral line at the symbol rate whose phase IS
      the sampling phase, so ``tau = arg(sum_n e[n] exp(-j2pi n/sps))
      * sps/2pi`` uses EVERY sample of the block — one dot against a
      precomputed phasor, no scan, and the estimate averages the
      whole block's energy instead of trusting two symbols.
    """
    n = bb_i.shape[-1]
    m = n // sps
    if timing == "envelope":
        w = 2.0 * np.pi * np.arange(n) / sps
        e = bb_i * bb_i + bb_q * bb_q
        cr = jnp.sum(e * jnp.asarray(np.cos(w), bb_i.dtype), axis=-1)
        ci = jnp.sum(e * jnp.asarray(np.sin(w), bb_i.dtype), axis=-1)
        tau = jnp.arctan2(ci, cr) * (sps / (2.0 * np.pi))
        cand = (jnp.round(tau).astype(jnp.int32) % sps)
    else:
        assert timing == "peak", timing
        # candidate offset: strongest sample in the first 2*sps (abs
        # value — the reference's signed-max comparison is a bug we do
        # not keep)
        search = jnp.abs(bb_i[..., : 2 * sps])
        cand = (jnp.argmax(search, axis=-1) % sps).astype(jnp.int32)
    resync = ~state.found
    offset = jnp.where(resync, cand, state.offset)

    # sample phase ``offset`` of every sps-group as a masked lane
    # reduction over the trailing [m, sps] reshape: a take_along_axis
    # with per-channel dynamic offsets lowers to a full gather (measured
    # ~23 ms/48-block batch at C=512 — the largest back-end stage); the
    # one-hot sum is pure VPU and picks the identical element (only a
    # selected -0.0 can come out as +0.0, which ``symbols``' >=0 and
    # ``lost``'s abs() cannot distinguish)
    phase = jnp.arange(sps, dtype=jnp.int32)
    onehot = (phase == offset[..., None])                 # [..., sps]
    pick = lambda bb: jnp.sum(                            # noqa: E731
        jnp.where(onehot[..., None, :],
                  bb[..., : m * sps].reshape(*bb.shape[:-1], m, sps),
                  0.0), axis=-1)
    sym_i = pick(bb_i)
    sym_q = pick(bb_q)
    symbols = (sym_i >= 0).astype(jnp.int8)

    thresh = 0.05
    lost = ((jnp.abs(sym_i[..., -1]) < thresh)
            & (jnp.abs(sym_i[..., -2]) < thresh))
    new = CDRState(offset=offset, found=~lost)
    return sym_i, sym_q, symbols, resync, new


def receiver_step(params: ReceiverParams, state: ReceiverState,
                  iq_u8: Array, cfg: ModeConfig,
                  precision=jax.lax.Precision.HIGHEST,
                  with_rds: Optional[bool] = None,
                  frontend: str = "auto", backend: str = "auto",
                  demod_kind: str = "diff",
                  cdr_timing: Optional[str] = None
                  ) -> tuple[ReceiverState, StepOutputs]:
    """Process one block of interleaved u8 IQ samples.

    ``iq_u8``: [..., block_size] uint8 (I even, Q odd — iofunc.cpp:113-120).
    Everything is static-shaped; safe under jit/scan/shard_map.

    Composed of three stages that the exact time-sharded receiver also
    uses separately: ``front_step`` (LTI), the stacked PLL scan, and
    ``back_step`` (NCO-mixed LTI) + CDR.  Every individual op sees the
    same inputs as before the split, so outputs are bit-identical.

    When the state carries an ``iqcorr`` tracker (init_state
    ``with_iqcorr=True``), each block is corrected with the coefficients
    accumulated over PREVIOUS blocks (strictly causal; block 0 is
    identity) and the front end's decimated pre-correction I/Q moments
    are folded into the tracker (computed at IF rate in the fused
    kernel's VMEM epilogue / from the stock path's ``i_ds`` — a raw-
    rate side pass measured -28% of the chain).
    """
    rds_enabled = _rds_on(cfg, with_rds) and state.rds is not None

    corr = new_iqcorr = None
    if state.iqcorr is not None:
        corr = iqcorr.coeffs(state.iqcorr)
        fstate, fo, mom = front_step(
            params, front_state_of(state), iq_u8, cfg,
            precision=precision, rds_enabled=rds_enabled,
            frontend=frontend, demod_kind=demod_kind, corr=corr,
            corr_moments=True)
        new_iqcorr = iqcorr.fold(state.iqcorr, mom)
    else:
        fstate, fo = front_step(params, front_state_of(state), iq_u8,
                                cfg, precision=precision,
                                rds_enabled=rds_enabled,
                                frontend=frontend, demod_kind=demod_kind)
    return _finish_step(params, state, fstate, fo, cfg, precision,
                        rds_enabled, backend, new_iqcorr=new_iqcorr,
                        cdr_timing=cdr_timing)


def receiver_step_if(params: ReceiverParams, state: ReceiverState,
                     i_if: Array, q_if: Array, cfg: ModeConfig,
                     precision=jax.lax.Precision.HIGHEST,
                     with_rds: Optional[bool] = None,
                     frontend: str = "auto", backend: str = "auto",
                     cdr_timing: Optional[str] = None
                     ) -> tuple[ReceiverState, StepOutputs]:
    """Process one block of IF-rate complex baseband (I/Q at
    ``cfg.if_fs``), e.g. one channel of ``ops/channelizer.py``'s DFT
    filter bank.  Identical to ``receiver_step`` from the FM demod
    onward; the RF LPF+decimate stage is the channelizer's job.

    An ``iqcorr`` tracker in the state estimates from (and corrects)
    the IF stream itself — valid for a direct IF capture; imbalance of
    a WIDEBAND tuner must instead be corrected before channelization
    (the image lands in the mirrored channel, out of per-channel
    reach)."""
    rds_enabled = _rds_on(cfg, with_rds) and state.rds is not None

    new_iqcorr = None
    if state.iqcorr is not None:
        c = iqcorr.coeffs(state.iqcorr)
        new_iqcorr = iqcorr.estimate(i_if, q_if, state.iqcorr)
        i_if, q_if = iqcorr.apply(i_if, q_if, c)

    fstate, fo = front_step_if(params, front_state_of(state), i_if, q_if,
                               cfg, precision=precision,
                               rds_enabled=rds_enabled, frontend=frontend)
    return _finish_step(params, state, fstate, fo, cfg, precision,
                        rds_enabled, backend, new_iqcorr=new_iqcorr,
                        cdr_timing=cdr_timing)


def _finish_step(params: ReceiverParams, state: ReceiverState,
                 fstate: FrontState, fo: FrontOut, cfg: ModeConfig,
                 precision, rds_enabled: bool, backend: str,
                 new_iqcorr=None, cdr_timing: Optional[str] = None
                 ) -> tuple[ReceiverState, StepOutputs]:
    if cdr_timing is None:
        import os
        cdr_timing = os.environ.get("DY4TPU_CDR", "peak")
    if cdr_timing not in ("peak", "envelope"):
        raise ValueError(f"unknown cdr_timing {cdr_timing!r}")
    # ---- stereo + RDS PLLs (project.cpp:118-133; fmMonoBlock.py:683) ----
    if rds_enabled:
        # stack the pilot (19 kHz, x2, bw .01) and RDS carrier (114 kHz,
        # x0.5, bw .001) loops on a lane axis: ONE scan instead of two
        rds = state.rds
        both_in = jnp.stack([fo.pilot, fo.carrier], axis=-2)  # [..., 2, N]
        both_state = jax.tree.map(lambda a, b: jnp.stack([a, b], -1),
                                  state.audio.pll, rds.pll)
        nco_i2, nco_q2, both_pll = pll.pll(
            both_in, both_state,
            freq=np.array([cfg.pll_freq, cfg.rds_pll_freq], np.float32),
            fs=cfg.if_fs,
            nco_scale=np.array([cfg.pll_nco_scale, cfg.rds_pll_nco_scale],
                               np.float32),
            norm_bandwidth=np.array([cfg.pll_bandwidth,
                                     cfg.rds_pll_bandwidth], np.float32))
        nco = nco_i2[..., 0, :]
        nco_i = nco_i2[..., 1, :]
        nco_q = nco_q2[..., 1, :]
        pll_state = jax.tree.map(lambda a: a[..., 0], both_pll)
        rds_pll = jax.tree.map(lambda a: a[..., 1], both_pll)
    else:
        nco_i = nco_q = None
        nco, _, pll_state = pll.pll(
            fo.pilot, state.audio.pll, freq=cfg.pll_freq, fs=cfg.if_fs,
            nco_scale=cfg.pll_nco_scale, norm_bandwidth=cfg.pll_bandwidth)

    # pilot-lock SNR estimate: pilot = A*cos(theta) + n(t) in its 1 kHz
    # band, nco = cos(2*theta_hat), so E[pilot^2 * nco] = (A^2/4) *
    # cos(2*phase_err) while the in-band noise is uncorrelated with the
    # NCO — A^2 comes out without a reference carrier, and a mono-only
    # station (no pilot) correctly reads -inf-ish (blend -> mono).
    p2 = jnp.mean(fo.pilot * fo.pilot, axis=-1)
    c2 = jnp.mean(fo.pilot * fo.pilot * nco, axis=-1)
    sig = jnp.maximum(2.0 * c2, 0.0)               # = A^2/2
    noise = jnp.maximum(p2 - sig, 1e-12)
    pilot_snr_db = 10.0 * jnp.log10(jnp.maximum(sig, 1e-12) / noise)

    bstate, bo = back_step(params, back_state_of(state), fo, nco, nco_i,
                           nco_q, cfg, precision=precision,
                           rds_enabled=rds_enabled, backend=backend)

    new_audio = AudioState(mono_delay=fstate.mono_delay,
                           mono_tail=bstate.mono_tail,
                           bank_tail=fstate.bank_tail,
                           stereo_tail=bstate.stereo_tail,
                           pll=pll_state)

    # ---- RDS clock/data recovery ----
    new_rds = None
    rds_out = (None,) * 6
    if rds_enabled:
        sym_i, sym_q, symbols, resync, cdr = _cdr(bo.bb_i, bo.bb_q,
                                                  rds.cdr, cfg.rds_sps,
                                                  timing=cdr_timing)
        new_rds = RDSState(carrier_tail=fstate.carrier_tail,
                           delay=fstate.rds_delay,
                           lpf_tail_i=bstate.lpf_tail_i,
                           lpf_tail_q=bstate.lpf_tail_q,
                           rrc_tail_i=bstate.rrc_tail_i,
                           rrc_tail_q=bstate.rrc_tail_q,
                           pll=rds_pll, cdr=cdr)
        rds_out = (bo.bb_i, bo.bb_q, symbols, sym_i, resync, cdr.offset)

    outputs = StepOutputs(mono=bo.mono, left=bo.left, right=bo.right,
                          rds_bb_i=rds_out[0], rds_bb_q=rds_out[1],
                          rds_symbols=rds_out[2], rds_sym_i=rds_out[3],
                          rds_resync=rds_out[4], rds_offset=rds_out[5],
                          pilot_snr_db=pilot_snr_db)
    return (ReceiverState(rf=fstate.rf, audio=new_audio, rds=new_rds,
                          iqcorr=new_iqcorr), outputs)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "stereo", "with_rds"))
def receiver_step_jit(params, state, iq_u8, cfg: ModeConfig,
                      stereo: bool = True,
                      with_rds: Optional[bool] = None):
    """Jitted step returning quantised s16 PCM like the reference CLI
    (project.cpp:307-317).

    Convenience only — for a serving loop, jit your own wrapper that
    CLOSES OVER ``params`` instead: as a jit argument the banded
    filter-matrix construction re-runs every call and blocks fusion
    (measured 2x on the sharded step, BASELINE round-5); every
    production path in this repo uses the closure form.
    """
    new_state, out = receiver_step(params, state, iq_u8, cfg,
                                   with_rds=with_rds)
    if stereo:
        pcm = mix.quantize_s16(mix.interleave(out.left, out.right))
    else:
        pcm = mix.quantize_s16(out.mono)
    return new_state, pcm, out


def run_blocks(params, state, iq_u8_blocks, cfg: ModeConfig):
    """Scan the receiver over a [num_blocks, ..., block_size] stream."""
    def body(st, blk):
        st, out = receiver_step(params, st, blk, cfg)
        return st, out
    return jax.lax.scan(body, state, iq_u8_blocks)
