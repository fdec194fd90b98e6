"""Type-II software PLL + NCO as a batched ``lax.scan``.

Reference: ``fmPLL`` (src/filter.cpp:174-228) and the Python-model twin with
quadrature output (``fmPll`` model/fmMonoBlock.py:344-379).  Loop constants
Cp=2.666, Ci=3.555, Kp=bw*Cp, Ki=bw^2*Ci.

Per input sample k:
    errorI = in[k] *  feedbackI
    errorQ = in[k] * -feedbackQ
    errorD = atan2(errorQ, errorI)        (0 when errorI == 0, the model's
                                           zero-input guard, fmMonoBlock.py:359)
    integrator += Ki * errorD
    phaseEst   += Kp * errorD + integrator
    angle      += 2*pi*freq/Fs            (reference: trigOffset++, then
                                           trigArg = 2*pi*(f/Fs)*trigOffset)
    feedback   = exp(j*(angle + phaseEst))
    nco[k+1]   = cos/sin((angle + phaseEst)*ncoScale + phaseAdjust)

and the emitted block is nco[0..N-1] with nco[0] carried from the previous
block — i.e. the NCO lags the input by one sample, exactly the reference's
block semantics.

TPU design notes
----------------
* The recurrence is inherently sequential, but it runs at the IF rate and is
  *batched over channels*: each scan step does a handful of VPU ops on a
  [channels] vector, so per-step cost amortises across the fleet of streams.
* The reference lets ``trigOffset`` and ``phaseEst`` grow without bound,
  which destroys float32 precision on long streams (filter.cpp:213-214).
  Here both are wrapped modulo 4*pi, which is exact for the nco scales the
  receiver uses (2.0 stereo, 0.5 RDS, 1.0) since scale*4*pi = 0 mod 2*pi.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_CP = 2.666
_CI = 3.555
_WRAP = 4.0 * jnp.pi  # exact modulus for ncoScale in {0.5, 1, 2}


class PLLState(NamedTuple):
    """Carried PLL state (project.cpp:46-53 + q_ncoState fmMonoBlock.py:441)."""
    feedback_i: Array    # [...], init 1.0
    feedback_q: Array    # [...], init 0.0
    integrator: Array    # [...], init 0.0
    phase_est: Array     # [...], init 0.0
    angle: Array         # [...], init 0.0 (2*pi*f/Fs*trigOffset, wrapped)
    nco: Array           # [...], init 1.0
    nco_q: Array         # [...], init 1.0 (quadrature, used by RDS)


def init_state(batch: tuple[int, ...] = (), dtype=jnp.float32) -> PLLState:
    z = jnp.zeros(batch, dtype)
    o = jnp.ones(batch, dtype)
    return PLLState(feedback_i=o, feedback_q=z, integrator=z, phase_est=z,
                    angle=z, nco=o, nco_q=o)


def _loop_consts(freq, fs, norm_bandwidth, dtype):
    """(kp, ki, dtheta) — shared by every scan flavour so the float ops
    (and therefore the trajectories) are bit-identical between them."""
    bw = jnp.asarray(norm_bandwidth, dtype)
    kp = bw * dtype.type(_CP)
    ki = bw * bw * dtype.type(_CI)
    dtheta = (dtype.type(2.0 * jnp.pi) * jnp.asarray(freq, dtype)
              / dtype.type(fs))
    return kp, ki, dtheta


def _make_step(kp, ki, dtheta, dtype):
    """The algebraic per-sample recurrence (see ``pll`` docstring).

    Shared between the per-block ``pll`` entry point and the global
    coded-sign scan used by the exact time-sharded receiver: sharing the
    closure guarantees the same op sequence, hence bit-identical carries.
    """
    pi = dtype.type(jnp.pi)
    two_pi = dtype.type(2.0 * jnp.pi)
    inv_two_pi = dtype.type(1.0 / (2.0 * jnp.pi))
    wrap = dtype.type(_WRAP)
    zero = dtype.type(0.0)

    # This closure is the per-IF-sample dependency chain of the whole
    # receiver (everything else batches over time), so it is written
    # divide-free: floor(v * 1/2pi) instead of v / 2pi, and the carried
    # phases wrap by range-checked conditional +-WRAP instead of
    # jnp.mod (a divide + sign fixups).  The conditional wrap is total:
    # per-step increments are loop-bounded (|kp*err + integ| << WRAP,
    # dtheta < WRAP), and even a garbage carry re-enters [0, WRAP) one
    # WRAP per step while the floor-based error_d wrap stays correct
    # for any phase magnitude.  Measured (scanned, [C=512 x 2 lanes]
    # serving shape incl. relayouts + NCO): 70.2 -> 58.5 ns/step;
    # full-chain bench 16.55 -> 17.36 GS/s (+4.9%).

    def step(carry, inp):
        integrator, phase_est, angle = carry
        tk, zk = inp
        phi = angle + phase_est
        # wrap(tk - phi) to [-pi, pi) == atan2 phase detector (see pll())
        v = tk - phi + pi
        error_d = v - two_pi * jnp.floor(v * inv_two_pi) - pi
        error_d = jnp.where(zk, 0.0, error_d)
        integrator = integrator + ki * error_d
        pe = phase_est + kp * error_d + integrator
        pe = pe - jnp.where(pe >= wrap, wrap, zero)
        phase_est = pe + jnp.where(pe < 0.0, wrap, zero)
        ang = angle + dtheta
        angle = ang - jnp.where(ang >= wrap, wrap, zero)
        # Emit the *previous* phase: output k is the NCO computed at k-1.
        return (integrator, phase_est, angle), phi

    return step


def _make_span_step(kp, ki, dtheta, span: int, dtype):
    """Decimated-feedback ("span") PLL step: one loop-filter update per
    ``span`` input samples — the opt-in throughput mode.

    The exact recurrence is the receiver's only per-IF-sample dependency
    chain, so its latency floor is ``N`` sequential steps per block.  This
    variant samples the phase detector once per span and evolves the loop
    through the span in closed form, cutting the sequential length to
    ``N/span`` — NOT bit-exact vs the reference loop (src/filter.cpp:
    174-228), so it is gated behind ``span>1`` / ``DY4TPU_PLL_SPAN`` and
    the default stays the exact per-sample loop.

    Derivation (err frozen over the span, sub-steps i = 1..K of the exact
    loop):  I_i = I0 + i*ki*err;  P_i = P0 + i*kp*err + i*I0 +
    ki*err*i(i+1)/2;  A_i = A0 + i*dtheta.  The carry update below is the
    i=K closed form; the emitted per-span value is phi0 = A0 + P0 and the
    within-span phases are reconstructed *vectorized* by the caller as
        out_j = phi0 + j*(dtheta + kp*err + I0) + j(j+1)/2 * ki*err .
    Loop dynamics match the per-sample loop under slowly-varying error
    (the effective per-span gains are the held-error accumulation of the
    per-sample gains), so bandwidth and lock behaviour carry over; the
    detector is sampled K-fold less often, so phase jitter under noise
    grows ~K-fold in variance — the quality bound is pinned in
    tests/test_pll_span.py (lock, stereo separation, RDS decode).
    """
    pi = dtype.type(jnp.pi)
    two_pi = dtype.type(2.0 * jnp.pi)
    inv_two_pi = dtype.type(1.0 / (2.0 * jnp.pi))
    wrap = dtype.type(_WRAP)
    zero = dtype.type(0.0)
    k = dtype.type(span)
    kp_eff = k * kp + ki * dtype.type(span * (span + 1) / 2.0)
    ki_eff = k * ki
    dth = k * jnp.asarray(dtheta, dtype)
    # pre-wrap the per-span angle increment (k*dtheta can exceed WRAP for
    # the 114.5 kHz RDS carrier) so the in-loop conditional wrap stays total
    dth_eff = dth - wrap * jnp.floor(dth / wrap)

    def step(carry, inp):
        integrator, phase_est, angle = carry
        tk, zk = inp
        phi = angle + phase_est
        v = tk - phi + pi
        error_d = v - two_pi * jnp.floor(v * inv_two_pi) - pi
        error_d = jnp.where(zk, 0.0, error_d)
        pe = phase_est + kp_eff * error_d + k * integrator
        integrator = integrator + ki_eff * error_d
        pe = pe - jnp.where(pe >= wrap, wrap, zero)
        pe = pe + jnp.where(pe < 0.0, wrap, zero)
        ang = angle + dth_eff
        angle = ang - jnp.where(ang >= wrap, wrap, zero)
        return (integrator, pe, angle), phi

    return step


def _span_targets(x, dtheta, span: int, dtype):
    """Span-averaged phase-detector targets, fully vectorized.

    The per-sample detector is err_i = wrap(pi*[x_i<0] - phi_i); sampling
    it once per span aliases its 2f ripple into the loop band (measured:
    NCO jitter grows ~sqrt(span)).  Instead, average the detector PHASOR
    over the span with the NCO's known within-span ramp compensated:
        S = sum_i sign(x_i) * exp(-j*i*dtheta),   T = arg(S),
    so err = wrap(T - phi0) sees the full K-sample average (sign(x_i) IS
    the per-sample target phasor: exp(j*pi*[x<0])).  S costs two [K]-dot
    products against constant cos/sin ramps + one batched atan2 — all
    outside the sequential scan.  Spans with no sign information
    (all-zero input or full phasor cancellation) return NaN, which the
    scan's zero-guard maps to err = 0.
    """
    xr = x.reshape(*x.shape[:-1], x.shape[-1] // span, span)
    sgn = jnp.sign(xr)                                   # 0 drops the sample
    i = jnp.arange(span, dtype=dtype)
    ramp = jnp.asarray(dtheta, dtype)[..., None] * i     # [(lanes), K]
    cosr = jnp.cos(ramp)[..., None, :]                   # [(lanes), 1, K]
    sinr = jnp.sin(ramp)[..., None, :]
    s_re = jnp.sum(sgn * cosr, axis=-1)                  # [..., M]
    s_im = -jnp.sum(sgn * sinr, axis=-1)
    t = jnp.arctan2(s_im, s_re)
    dead = s_re * s_re + s_im * s_im < dtype.type(1e-6)
    return jnp.where(dead, dtype.type(jnp.nan), t)


def _span_expand(phi0, i0, targets, kp, ki, dtheta, span: int, dtype):
    """Vectorized within-span phase reconstruction (see _make_span_step):
    [..., M] per-span (phi0, I0, detector target) -> [..., M*span]."""
    pi = dtype.type(jnp.pi)
    two_pi = dtype.type(2.0 * jnp.pi)
    inv_two_pi = dtype.type(1.0 / (2.0 * jnp.pi))
    v = targets - phi0 + pi
    err = v - two_pi * jnp.floor(v * inv_two_pi) - pi
    err = jnp.where(jnp.isnan(targets), dtype.type(0.0), err)
    kpb = jnp.asarray(kp, dtype)[..., None]
    kib = jnp.asarray(ki, dtype)[..., None]
    dthb = jnp.asarray(dtheta, dtype)[..., None]
    lin = dthb + kpb * err + i0                       # [..., M]
    quad = kib * err
    j = jnp.arange(span, dtype=dtype)                 # [K]
    tri = j * (j + dtype.type(1.0)) * dtype.type(0.5)
    out = (phi0[..., None] + j * lin[..., None]
           + tri * quad[..., None])                   # [..., M, K]
    return out.reshape(*phi0.shape[:-1], phi0.shape[-1] * span)


# sign codes for the gather-friendly PLL input representation: the input
# enters the recurrence only through its sign + zero-guard, so an int8
# code stream is a lossless (and 4x smaller) stand-in for the f32 signal.
CODE_POS = 0
CODE_NEG = 1
CODE_ZERO = 2
CODE_INVALID = 3   # pre-stream padding: freezes the carry entirely


def encode_sign(x: Array) -> Array:
    """f32 PLL input -> int8 sign codes (POS/NEG/ZERO)."""
    return jnp.where(x == 0.0, jnp.int8(CODE_ZERO),
                     jnp.where(x < 0.0, jnp.int8(CODE_NEG),
                               jnp.int8(CODE_POS)))


def phase_scan_coded(codes: Array, carry: tuple[Array, Array, Array], *,
                     freq, fs: float, norm_bandwidth,
                     split_at: int, unroll: int = 32, impl: str = "auto"):
    """Run the PLL phase recurrence over an int8 sign-code stream.

    ``codes``: [..., M]; ``carry``: (integrator, phase_est, angle), each
    [...].  ``CODE_INVALID`` samples leave the carry untouched (used to
    pad the warm-up region before the true stream start).  Returns
    ``(phis [..., M], carry_at_split, carry_end)`` where ``carry_at_split``
    is the carry after ``split_at`` samples — the state the next chunk's
    scan must resume from in the exact time-sharded receiver.

    For valid samples the ops are bit-identical to ``pll`` (shared step
    closure; the freeze is a ``where(valid, new, old)`` which is exact
    pass-through when valid).
    """
    dtype = carry[0].dtype
    kp, ki, dtheta = _loop_consts(freq, fs, norm_bandwidth, dtype)

    if impl == "auto":
        impl = ("pallas" if jax.default_backend() == "tpu"
                and dtype == jnp.float32 else "scan")
    if impl == "pallas":
        from dy4tpu.ops import pll_pallas  # deferred: optional path
        mk = lambda kp_, ki_, dth_: _make_step(kp_, ki_, dth_, dtype)
        return pll_pallas.phase_scan_coded(
            codes, kp, ki, dtheta, carry, mk, split_at=split_at,
            interpret=jax.default_backend() != "tpu")

    base = _make_step(kp, ki, dtheta, dtype)

    def step(c, code):
        tk = jnp.where(code == CODE_NEG, dtype.type(jnp.pi),
                       dtype.type(0.0))
        zk = code == CODE_ZERO
        valid = code != CODE_INVALID
        (i2, p2, a2), phi = base(c, (tk, zk))
        i0, p0, a0 = c
        return (jnp.where(valid, i2, i0), jnp.where(valid, p2, p0),
                jnp.where(valid, a2, a0)), phi

    codes_t = jnp.moveaxis(codes, -1, 0)             # [M, ...]
    carry_mid, phis1 = lax.scan(step, carry, codes_t[:split_at],
                                unroll=unroll)
    carry_end, phis2 = lax.scan(step, carry_mid, codes_t[split_at:],
                                unroll=unroll)
    phis = jnp.moveaxis(jnp.concatenate([phis1, phis2], axis=0), 0, -1)
    return phis, carry_mid, carry_end


def pll(pll_in: Array, state: PLLState, *, freq, fs: float,
        nco_scale=1.0, phase_adjust: float = 0.0,
        norm_bandwidth=0.01,
        unroll: int = 32, impl: str = "auto",
        span: int | None = None) -> tuple[Array, Array, PLLState]:
    """Run the PLL over a block (algebraic fast path).

    ``pll_in``: [..., N]; state fields: [...].  Returns
    ``(nco_i, nco_q, new_state)`` with outputs shaped like the input.
    ``freq``/``nco_scale``/``norm_bandwidth`` may be scalars or per-lane
    arrays broadcastable to the batch dims (several loop configurations
    in one scan).

    The reference phase detector is
        errorD = atan2(-x*sin(phi), x*cos(phi)),  phi = angle + phaseEst,
    and since atan2 is scale-invariant this equals exactly
        wrap(pi*[x < 0] - phi)   (wrap to (-pi, pi]),
    i.e. the input enters only through its *sign*.  The scan body therefore
    needs no transcendentals at all — arctan2/cos/sin of the reference loop
    (filter.cpp:196-216) hoist out: the sign targets are precomputed
    vectorized, the NCO cos/sin are applied vectorized to the emitted phase
    sequence after the scan.  The recurrence itself is ~8 adds/multiplies on
    a [channels] vector per sample.

    ``impl``: "scan" (XLA lax.scan), "pallas" (time-major TPU kernel,
    ops/pll_pallas.py — bit-identical output, much faster at serving
    batch), or "auto" (pallas on TPU, scan elsewhere).

    ``span``: 1 (default; resolved from env ``DY4TPU_PLL_SPAN`` when
    None) keeps the exact per-sample loop.  span>1 selects the
    decimated-feedback throughput mode (_make_span_step): the loop filter
    updates once per ``span`` samples and the within-span phases are
    reconstructed vectorized — the sequential chain shrinks span-fold.
    NOT bit-exact vs the reference; quality pinned in
    tests/test_pll_span.py.  Requires ``N % span == 0``.
    """
    dtype = pll_in.dtype
    # constants may be scalars or per-lane arrays broadcastable against the
    # batch dims (used to run several PLL configurations in ONE scan, e.g.
    # the stereo pilot and the RDS carrier stacked on a lane axis)
    kp, ki, dtheta = _loop_consts(freq, fs, norm_bandwidth, dtype)
    scale = jnp.asarray(nco_scale, dtype)
    pi = dtype.type(jnp.pi)

    if impl == "auto":
        impl = ("pallas" if jax.default_backend() == "tpu"
                and dtype == jnp.float32 else "scan")
    if span is None:
        span = int(os.environ.get("DY4TPU_PLL_SPAN", "1"))
    carry0 = (state.integrator, state.phase_est, state.angle)
    if span > 1:
        n = pll_in.shape[-1]
        if n % span:
            raise ValueError(f"block length {n} not divisible by "
                             f"pll span {span}")
        targets = _span_targets(pll_in, dtheta, span, dtype)  # [..., M]
        if impl == "pallas":
            from dy4tpu.ops import pll_pallas  # deferred: optional path
            mk = lambda kp_, ki_, dth_: _make_span_step(kp_, ki_, dth_,
                                                        span, dtype)
            interp = jax.default_backend() != "tpu"
            if os.environ.get("DY4TPU_SPAN_EMIT", "xla") == "kernel":
                # measured NEGATIVE (kept for A/B): emitting the K
                # within-span phases from the kernel serialises the K
                # unrolled stores + err recompute with the carry chain —
                # stage 11.7 -> 17.8 ms at K=8 (C=512 B=48).  The XLA
                # expansion below overlaps with other chain stages.
                phis, (integ, pe, ang) = pll_pallas.phase_scan(
                    targets, kp, ki, dtheta, carry0, mk, mode="target",
                    expand=span, interpret=interp)
            else:
                phi0, i0, (integ, pe, ang) = pll_pallas.phase_scan(
                    targets, kp, ki, dtheta, carry0, mk, mode="target",
                    emit_integ=True, interpret=interp)
                phis = _span_expand(phi0, i0, targets, kp, ki, dtheta,
                                    span, dtype)
        else:
            tt = jnp.moveaxis(targets, -1, 0)
            is_zero = jnp.isnan(tt)
            sstep = _make_span_step(kp, ki, dtheta, span, dtype)

            def wstep(c, inp):
                c2, phi = sstep(c, inp)
                return c2, (phi, c[0])   # emit pre-update integrator too

            (integ, pe, ang), (phi0, i0) = lax.scan(
                wstep, carry0, (tt, is_zero), unroll=unroll)
            phi0 = jnp.moveaxis(phi0, 0, -1)
            i0 = jnp.moveaxis(i0, 0, -1)
            phis = _span_expand(phi0, i0, targets, kp, ki, dtheta, span,
                                dtype)
    elif impl == "pallas":
        from dy4tpu.ops import pll_pallas  # deferred: optional path
        mk = lambda kp_, ki_, dth_: _make_step(kp_, ki_, dth_, dtype)
        phis, (integ, pe, ang) = pll_pallas.phase_scan(
            pll_in, kp, ki, dtheta, carry0, mk,
            interpret=jax.default_backend() != "tpu")
    else:
        x = jnp.moveaxis(pll_in, -1, 0)  # [N, ...] scan over time
        target = jnp.where(x < 0, pi, dtype.type(0.0))
        is_zero = x == 0.0  # zero-input guard (fmMonoBlock.py:359-362)

        step = _make_step(kp, ki, dtheta, dtype)
        (integ, pe, ang), phis = lax.scan(step, carry0, (target, is_zero),
                                          unroll=unroll)
        phis = jnp.moveaxis(phis, 0, -1)               # [..., N]
    out_arg = phis * scale[..., None] + dtype.type(phase_adjust)
    # bulk NCO synthesis: bounded-domain fused sincos (~3x libm; the
    # phases are wrapped so |arg| << trig.BOUND) — ops/trig.py
    from dy4tpu.ops import trig
    nco_q, nco_i = trig.nco_sincos(out_arg)
    # first output comes from the carried NCO (handles the reference's
    # inconsistent q_ncoState=1.0 init, fmMonoBlock.py:441)
    nco_i = jnp.concatenate([state.nco[..., None], nco_i[..., 1:]], -1)
    nco_q = jnp.concatenate([state.nco_q[..., None], nco_q[..., 1:]], -1)

    phi_end = ang + pe
    end_arg = phi_end * scale + dtype.type(phase_adjust)
    # the carried nco/nco_q become the NEXT block's first emitted sample,
    # so they must ride the SAME trig kernel as the bulk synthesis —
    # streaming vs contiguous runs stay bit-identical
    # (tests/test_pll_pallas.py::test_pallas_streaming_continuity)
    end_q, end_i = trig.nco_sincos(end_arg)
    new_state = PLLState(
        feedback_i=jnp.cos(phi_end), feedback_q=jnp.sin(phi_end),
        integrator=integ, phase_est=pe, angle=ang,
        nco=end_i, nco_q=end_q)
    return nco_i, nco_q, new_state


def pll_reference(pll_in: Array, state: PLLState, *, freq: float, fs: float,
                  nco_scale: float = 1.0, phase_adjust: float = 0.0,
                  norm_bandwidth: float = 0.01,
                  unroll: int = 8) -> tuple[Array, Array, PLLState]:
    """Literal transcription of the reference loop (filter.cpp:174-228):
    one arctan2 + cos/sin pair per sample inside the scan.  Kept as the
    cross-check for the algebraic fast path (tests/test_demod_pll.py)."""
    kp = norm_bandwidth * _CP
    ki = norm_bandwidth * norm_bandwidth * _CI
    dtheta = 2.0 * jnp.pi * (freq / fs)

    x = jnp.moveaxis(pll_in, -1, 0)  # [N, ...] scan over time

    def step(carry: PLLState, xk: Array):
        error_i = xk * carry.feedback_i
        error_q = xk * -carry.feedback_q
        error_d = jnp.where(error_i == 0.0, 0.0,
                            jnp.arctan2(error_q, error_i))
        integrator = carry.integrator + ki * error_d
        phase_est = jnp.mod(carry.phase_est + kp * error_d + integrator,
                            _WRAP)
        angle = jnp.mod(carry.angle + dtheta, _WRAP)
        trig_arg = angle + phase_est
        out_arg = trig_arg * nco_scale + phase_adjust
        new = PLLState(
            feedback_i=jnp.cos(trig_arg),
            feedback_q=jnp.sin(trig_arg),
            integrator=integrator,
            phase_est=phase_est,
            angle=angle,
            nco=jnp.cos(out_arg),
            nco_q=jnp.sin(out_arg),
        )
        # Emit the *previous* NCO sample: output k is nco computed at k-1.
        return new, (carry.nco, carry.nco_q)

    new_state, (nco_i, nco_q) = lax.scan(step, state, x, unroll=unroll)
    return (jnp.moveaxis(nco_i, 0, -1), jnp.moveaxis(nco_q, 0, -1),
            new_state)
