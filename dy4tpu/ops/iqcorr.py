"""Blind I/Q impairment correction: DC offset + gain/phase imbalance.

Beyond-parity subsystem (the reference consumes RTL-SDR u8 captures
as-is, ``src/iofunc.cpp:113-120`` / ``model/fmMonoBasic.py:30-42``;
real direct-conversion tuners add LO leakage and quadrature mismatch):
a per-channel blind estimator + 2x2 corrector for the standard
receiver impairment model

    i_obs = i + d_i
    q_obs = g * (q*cos(phi) + i*sin(phi)) + d_q

which images a tone at +f onto -f with rejection
``IRR = |1 + g e^{j phi}|^2 / |1 - g e^{j phi}|^2``.  On a zero-IF FM
channel the image lands on the signal itself, so imbalance reads as a
demod noise floor (and the DC spur as discriminator distortion).

Estimation is moment-based (blind Gram-Schmidt): over the impairment
model with ideal I/Q zero-mean, equal-power and uncorrelated — true
for an FM multiplex, whose phase sweeps many cycles per block —

    E[i] = d_i              E[q] = d_q
    Cii  = P                Ciq  = g*P*sin(phi)      Cqq = g^2*P

so the centered Gram-Schmidt step recovers the exact inverse:

    i_c = i_obs - d_i
    q_c = (q_obs - d_q - rho*i_c) * s,   rho = Ciq/Cii,
                                         s = sqrt(Cii/(Cqq - rho*Ciq))

(= exactly ``q`` under the model: the rho-projection removes the
sin(phi) leakage and s restores Q's power to I's).  Out-of-band noise
passes through the same impairment, so estimating from the RAW stream
(before channel filtering) is equally consistent and needs no extra
signal path.

Moments are EMA-accumulated across blocks in one static-shaped
``IQCorrState`` pytree (jit/scan-safe).  NOTE: like the AFC loop
(``ops/afc.py``), the EMA is cross-block feedback — the exact
time-sharded receiver (``parallel/sharded.py``) cannot replay it from
a bounded halo, so correction is rejected there (PARITY.md
"Deliberate deviations").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class IQCorrState(NamedTuple):
    """EMA'd raw moments of the observed stream (batch-shaped), plus a
    block count for warm-up debiasing.  Moments are UN-debiased EMA
    accumulators (start at 0); ``coeffs`` divides by ``1-(1-a)^count``."""
    mean_i: Array
    mean_q: Array
    m_ii: Array    # E[i^2] (raw, not centered)
    m_qq: Array
    m_iq: Array
    count: Array   # int32 blocks folded in


class IQCorrCoeffs(NamedTuple):
    """Correction ``i_c = i - dc_i; q_c = (q - dc_q - rho*i_c) * s``.
    ``rho``/``s`` are scale-free; ``dc_*`` are in the estimation
    stream's units (callers filtering before applying scale them by the
    filter's DC gain — a constant offset through an LTI filter is
    ``d * sum(h)``)."""
    dc_i: Array
    dc_q: Array
    rho: Array
    s: Array


def init_iqcorr_state(batch: tuple[int, ...] = (),
                      dtype=jnp.float32) -> IQCorrState:
    z = jnp.zeros(batch, dtype)
    return IQCorrState(mean_i=z, mean_q=z, m_ii=z, m_qq=z, m_iq=z,
                       count=jnp.zeros(batch, jnp.int32))


def estimate(i: Array, q: Array, state: IQCorrState, *,
             alpha: float = 0.2) -> IQCorrState:
    """Fold one block of observed I/Q ([..., N]) into the EMA moments."""
    a = jnp.float32(alpha)
    ema = lambda m, x: m * (1.0 - a) + a * x  # noqa: E731
    return IQCorrState(
        mean_i=ema(state.mean_i, jnp.mean(i, axis=-1)),
        mean_q=ema(state.mean_q, jnp.mean(q, axis=-1)),
        m_ii=ema(state.m_ii, jnp.mean(i * i, axis=-1)),
        m_qq=ema(state.m_qq, jnp.mean(q * q, axis=-1)),
        m_iq=ema(state.m_iq, jnp.mean(i * q, axis=-1)),
        count=state.count + 1)


def estimate_u8(iq_u8: Array, state: IQCorrState, *,
                alpha: float = 0.2, frac: int = 8) -> IQCorrState:
    """Fold a raw interleaved-u8 block ([..., 2N], I even / Q odd —
    iofunc.cpp:113-120) into the moments, in receiver-normalized units
    ((x - 128)/128).  ``frac``: estimate from the leading ``1/frac`` of
    the block — a contiguous slice, so the extra HBM traffic of this
    side pass is bounded at ~1/frac of one raw-block read (moments over
    ~100k samples are already tight; the EMA smooths the rest)."""
    n = iq_u8.shape[-1] // 2
    m = max(1, n // frac)
    x = (iq_u8[..., : 2 * m].astype(jnp.float32) - 128.0) / 128.0
    pairs = x.reshape(*x.shape[:-1], m, 2)
    return estimate(pairs[..., 0], pairs[..., 1], state, alpha=alpha)


def coeffs(state: IQCorrState, *, min_power: float = 1e-6
           ) -> IQCorrCoeffs:
    """Correction coefficients from the accumulated moments.

    Identity (dc=0, rho=0, s=1) until at least one block has been
    folded in or while the stream is too weak to trust (``Cii`` below
    ``min_power`` — e.g. a squelched channel), so ``apply`` is always
    safe to call unconditionally."""
    # debias the EMA warm-up: an EMA seeded at 0 after n blocks has
    # weight 1-(1-a)^n on the data; dividing restores an unbiased mean.
    # alpha here must only match `estimate`'s for exact debiasing — the
    # steady state is alpha-independent — so it is fixed at the default.
    w = 1.0 - jnp.power(jnp.float32(0.8), state.count.astype(jnp.float32))
    w = jnp.maximum(w, jnp.float32(1e-12))
    mi, mq = state.mean_i / w, state.mean_q / w
    cii = state.m_ii / w - mi * mi
    cqq = state.m_qq / w - mq * mq
    ciq = state.m_iq / w - mi * mq

    ok = (state.count > 0) & (cii > min_power)
    safe_cii = jnp.where(ok, cii, 1.0)
    rho = jnp.where(ok, ciq / safe_cii, 0.0)
    resid = cqq - rho * ciq
    s = jnp.where(ok & (resid > min_power * 1e-3),
                  jnp.sqrt(safe_cii / jnp.maximum(resid, 1e-30)), 1.0)
    zero = jnp.zeros_like(rho)
    return IQCorrCoeffs(dc_i=jnp.where(ok, mi, zero),
                        dc_q=jnp.where(ok, mq, zero),
                        rho=rho, s=s)


def apply(i: Array, q: Array, c: IQCorrCoeffs, *,
          dc_scale: float | Array = 1.0) -> tuple[Array, Array]:
    """Apply the correction to an I/Q block ([..., N]; coeffs batch-
    shaped).  ``dc_scale``: DC gain between the estimation point and
    the application point (e.g. ``sum(h_rf)`` when applying after the
    RF LPF — the 2x2 part commutes with any per-component LTI filter,
    only the offsets pick up the filter's DC gain)."""
    dci = (c.dc_i * dc_scale)[..., None]
    dcq = (c.dc_q * dc_scale)[..., None]
    i_c = i - dci
    q_c = (q - dcq - c.rho[..., None] * i_c) * c.s[..., None]
    return i_c, q_c


def image_rejection_db(gain: float, phase_deg: float) -> float:
    """IRR of the impairment model (test/diagnostic helper)."""
    e = gain * np.exp(1j * np.deg2rad(phase_deg))
    return float(10.0 * np.log10(np.abs(1 + e) ** 2 / np.abs(1 - e) ** 2))


def impair(i: Array, q: Array, *, dc_i: float = 0.0, dc_q: float = 0.0,
           gain: float = 1.0, phase_deg: float = 0.0):
    """Apply the impairment model (TX/test side; numpy or jax arrays)."""
    phi = np.deg2rad(phase_deg)
    return (i + dc_i,
            gain * (q * np.cos(phi) + i * np.sin(phi)) + dc_q)
