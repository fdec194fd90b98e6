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

Estimator: a streaming least-squares ELLIPSE FIT.  An FM carrier has
constant modulus, so its clean samples lie on a circle; the impairment
is the affine map ``p = p0 + W u`` (W lower-triangular), which turns
that circle into an ellipse whose CENTER is the DC offset and whose
SHAPE is exactly the imbalance:

    (p - p0)^T (W W^T)^{-1} (p - p0) = A^2,
    W = [[1, 0], [g sin(phi), g cos(phi)]]

Fitting the conic ``a x^2 + b xy + c y^2 + d x + e y = 1`` by least
squares (a 5x5 normal-equation solve over streaming moments up to
order 4) and reading

    center:  [[2a, b], [b, 2c]] @ p0 = [-d, -e]
    rho = -b / (2c)             (= g sin(phi))
    s   = 1 / sqrt(a/c - rho^2) (= 1 / (g cos(phi)))

recovers the exact inverse as ``i_c = i - dc_i;
q_c = (q - dc_q - rho*i_c) * s``.

WHY an ellipse fit and not second-order blind moments (Gram-Schmidt on
E[i q]/E[i^2] etc.): the moment route assumes the clean signal is
zero-mean/proper, but a real FM waveform has a residual carrier LINE
(the Bessel J0 component) sitting exactly at DC on a zero-IF tuner —
measured on the synthesized broadcast it reads as a fake dc=-0.04 /
rho=0.096 "impairment" whose "correction" COSTS 6 dB of stereo
separation on a perfectly clean capture.  The ellipse fit uses the
constant-modulus structure instead of ensemble statistics, so
deterministic content cannot bias it: clean circle in, identity out.
Channel noise scatters points AROUND the ellipse (a benign
toward-circular bias); multipath thickens it into an annulus whose
symmetric fit again degrades toward the identity, not away from it.

Moments are EMA-accumulated across blocks in one static-shaped
``IQCorrState`` pytree (jit/scan-safe); the EMA's warm-up scale
cancels in the normal-equation solve, so no debiasing is needed.
NOTE: like the AFC loop (``ops/afc.py``), the EMA is cross-block
feedback — the exact time-sharded receiver (``parallel/sharded.py``)
cannot replay it from a bounded halo, so correction is never enabled
there (PARITY.md "Deliberate deviations").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# moment index layout of IQCorrState.m: E[i^p * q^r] at _POWERS[k]
_POWERS = ((4, 0), (3, 1), (2, 2), (1, 3), (0, 4),
           (3, 0), (2, 1), (1, 2), (0, 3),
           (2, 0), (1, 1), (0, 2), (1, 0), (0, 1))
_IDX = {pq: k for k, pq in enumerate(_POWERS)}


class IQCorrState(NamedTuple):
    """EMA'd raw moments E[i^p q^r] (order <= 4) of the observed
    stream, batch-shaped with a trailing [14] moment axis, plus a
    block count (gates the cold-start identity)."""
    m: Array       # [..., 14] float32
    count: Array   # [...] int32 blocks folded in


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
    return IQCorrState(m=jnp.zeros((*batch, len(_POWERS)), dtype),
                       count=jnp.zeros(batch, jnp.int32))


def moments(i: Array, q: Array) -> Array:
    """The 14 conic-fit moments E[i^p q^r] of one block ([..., N] ->
    [..., 14], ``_POWERS`` order).  WHERE this runs matters for cost:
    at RAW RF rate the ~9 fourth-order temporaries measured -28% of
    the whole chain (HBM round trips); the production paths compute it
    at IF rate — the fused front kernel emits it from its in-VMEM
    decimated streams (ops/frontend_pallas.py, pre-correction), the
    stock path from ``i_ds``/``q_ds`` — where it is ~free.  The RF
    LPF's passband gain is 1, so estimating after it only sheds
    out-of-band noise; its slight constant-modulus ripple (Carson
    bandwidth vs the 100 kHz cutoff) stays under the coeffs deadband."""
    i = i.astype(jnp.float32)
    q = q.astype(jnp.float32)
    return jnp.stack(
        [jnp.mean(i ** p * q ** r if r else i ** p, axis=-1)
         if p else jnp.mean(q ** r, axis=-1)
         for p, r in _POWERS], axis=-1)


def fold(state: IQCorrState, mom: Array, *,
         alpha: float = 0.2) -> IQCorrState:
    """EMA one block's moments ([..., 14]) into the tracker state."""
    a = jnp.float32(alpha)
    return IQCorrState(m=state.m * (1.0 - a) + a * mom,
                       count=state.count + 1)


def estimate(i: Array, q: Array, state: IQCorrState, *,
             alpha: float = 0.2) -> IQCorrState:
    """Fold one block of observed I/Q ([..., N]) into the moments."""
    return fold(state, moments(i, q), alpha=alpha)


def coeffs(state: IQCorrState, *, min_power: float = 1e-6,
           deadband_dc: float = 0.005, deadband: float = 0.02
           ) -> IQCorrCoeffs:
    """Correction coefficients from the accumulated moments: solve the
    conic normal equations (batched 5x5), then read center and shape.

    Identity (dc=0, rho=0, s=1) until at least one block has been
    folded in, while the stream is too weak to trust (power below
    ``min_power`` — e.g. a squelched channel), or when the fit is
    degenerate (non-finite / non-elliptic solve), so ``apply`` is
    always safe to call unconditionally.

    Deadbands: each component below its threshold snaps to the exact
    identity, making the tracker-on decode of a HEALTHY tuner
    bit-identical to tracker-off once warm.  The fit still carries
    quantization/noise scatter; real faults (>= ~0.2 dB gain skew,
    >= ~1.2 deg quadrature, >= ~0.6 u8-LSB DC) sit far above the
    thresholds.  ``deadband*=0`` disables."""
    m = state.m
    g = lambda p, r: m[..., _IDX[(p, r)]]  # noqa: E731

    # normal equations for v = (x^2, xy, y^2, x, y), target 1:
    # (E[v v^T]) beta = E[v] — the EMA warm-up scale cancels here.
    # E[v v^T] is a Gram matrix (symmetric positive definite whenever
    # the data spans), so solve by an UNROLLED 5x5 Cholesky: pure
    # batched elementwise ops.  (jnp.linalg.solve's pivoted LU inside
    # the receiver scan blew the TPU compile past 10 minutes.)
    rows = [
        [g(4, 0), g(3, 1), g(2, 2), g(3, 0), g(2, 1)],
        [g(3, 1), g(2, 2), g(1, 3), g(2, 1), g(1, 2)],
        [g(2, 2), g(1, 3), g(0, 4), g(1, 2), g(0, 3)],
        [g(3, 0), g(2, 1), g(1, 2), g(2, 0), g(1, 1)],
        [g(2, 1), g(1, 2), g(0, 3), g(1, 1), g(0, 2)],
    ]
    h = [g(2, 0), g(1, 1), g(0, 2), g(1, 0), g(0, 1)]

    power = g(2, 0) - g(1, 0) ** 2
    ok = (state.count > 0) & (power > min_power)

    L = [[None] * 5 for _ in range(5)]
    for i in range(5):
        for j in range(i + 1):
            v = rows[i][j]
            for k in range(j):
                v = v - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(v, 1e-20))
            else:
                L[i][j] = v / L[j][j]
    y = [None] * 5
    for i in range(5):
        v = h[i]
        for k in range(i):
            v = v - L[i][k] * y[k]
        y[i] = v / L[i][i]
    beta = [None] * 5
    for i in reversed(range(5)):
        v = y[i]
        for k in range(i + 1, 5):
            v = v - L[k][i] * beta[k]
        beta[i] = v / L[i][i]
    a, b, c, d, e = beta

    # center: [[2a, b], [b, 2c]] p0 = [-d, -e]
    det2 = 4.0 * a * c - b * b
    safe = jnp.where(jnp.abs(det2) > 1e-20, det2, 1.0)
    x0 = (-2.0 * c * d + b * e) / safe
    y0 = (-2.0 * a * e + b * d) / safe
    rho = -b / (2.0 * jnp.where(jnp.abs(c) > 1e-20, c, 1.0))
    w22sq = a / jnp.where(jnp.abs(c) > 1e-20, c, 1.0) - rho * rho
    s = 1.0 / jnp.sqrt(jnp.maximum(w22sq, 1e-12))

    # the fit is trustworthy only when it is actually an ellipse
    # (a, c > 0, positive-definite quadratic) and everything is finite
    fin = (jnp.isfinite(x0) & jnp.isfinite(y0) & jnp.isfinite(rho)
           & jnp.isfinite(s))
    ok = ok & fin & (a > 0.0) & (c > 0.0) & (det2 > 0.0) & (w22sq > 1e-6)

    zero = jnp.zeros_like(rho)
    one = jnp.ones_like(rho)
    gate = lambda v, off, t: jnp.where(          # noqa: E731
        jnp.abs(v - off) > t, v, jnp.full_like(v, off))
    return IQCorrCoeffs(
        dc_i=gate(jnp.where(ok, x0, zero), 0.0, deadband_dc),
        dc_q=gate(jnp.where(ok, y0, zero), 0.0, deadband_dc),
        rho=gate(jnp.where(ok, rho, zero), 0.0, deadband),
        s=gate(jnp.where(ok, s, one), 1.0, deadband))


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


def coeffs_gaussian(state: IQCorrState, *, min_power: float = 1e-6,
                    deadband_dc: float = 0.005, deadband: float = 0.02
                    ) -> IQCorrCoeffs:
    """Second-order (Gaussian) readout of the accumulated moments — the
    WIDEBAND estimator (VERDICT r4 item 4).

    The narrowband path needs the ellipse fit because a zero-IF FM
    channel parks its carrier line exactly at DC, biasing ensemble
    moments (module docstring).  A WIDEBAND multi-station capture has
    no such line at DC (every station's residual carrier sits on its
    own channel grid and rotates), and the sum is near-circular
    Gaussian — for which the impaired covariance is EXACTLY
    ``W W^T sigma^2``:

        dc  = E[p],   C = cov(p) = [[v_i, c_iq], [c_iq, v_q]],
        rho = c_iq / v_i              (= g sin(phi))
        s   = 1 / sqrt(v_q/v_i - rho^2)   (= 1 / (g cos(phi)))

    (The conic LSQ, run on a FILLED Gaussian cloud instead of a ring,
    is measurably biased — ~20% low on rho and wrong-signed DC in the
    accuracy test — because it weights radii unequally; second-order
    moments are the unbiased estimator for this signal class.)  Guards
    and deadbands mirror ``coeffs``: identity until a block is folded,
    under ``min_power``, or on a degenerate readout."""
    m = state.m
    g = lambda p, r: m[..., _IDX[(p, r)]]  # noqa: E731
    dc_i = g(1, 0)
    dc_q = g(0, 1)
    v_i = g(2, 0) - dc_i * dc_i
    v_q = g(0, 2) - dc_q * dc_q
    c_iq = g(1, 1) - dc_i * dc_q
    ok = (state.count > 0) & (v_i > min_power)
    rho = c_iq / jnp.where(v_i > min_power, v_i, 1.0)
    w22sq = v_q / jnp.where(v_i > min_power, v_i, 1.0) - rho * rho
    s = 1.0 / jnp.sqrt(jnp.maximum(w22sq, 1e-12))
    fin = (jnp.isfinite(dc_i) & jnp.isfinite(dc_q) & jnp.isfinite(rho)
           & jnp.isfinite(s))
    ok = ok & fin & (w22sq > 1e-6)
    zero = jnp.zeros_like(rho)
    one = jnp.ones_like(rho)
    gate = lambda v, off, t: jnp.where(          # noqa: E731
        jnp.abs(v - off) > t, v, jnp.full_like(v, off))
    return IQCorrCoeffs(
        dc_i=gate(jnp.where(ok, dc_i, zero), 0.0, deadband_dc),
        dc_q=gate(jnp.where(ok, dc_q, zero), 0.0, deadband_dc),
        rho=gate(jnp.where(ok, rho, zero), 0.0, deadband),
        s=gate(jnp.where(ok, s, one), 1.0, deadband))


def channel_affine(c: IQCorrCoeffs):
    """The correction as an R-linear map on the complex stream — the
    form that commutes through a real-coefficient filter bank (the
    wideband pre-bank corrector, VERDICT r4 item 4).

    ``apply`` in complex form: with w = i + jq observed,

        z_c = Re(w)(1 - j s rho) + j s Im(w) - kappa
            = alpha w + beta conj(w) - kappa,
        alpha = (1 + s - j s rho)/2,
        beta  = (1 - s - j s rho)/2,
        kappa = dc_i (1 - j s rho) + j s dc_q

    Because every channelizer branch filter is real and the DFT maps
    conj(input) to the conjugate MIRROR channel
    (``y_c(conj z) = conj(y_{(-c) mod C}(z))``), correcting the wideband
    stream BEFORE the bank equals, exactly and linearly,

        y'_c = alpha y_c + beta conj(y_{(-c) mod C}) - kappa g_dc[c]

    AFTER the bank (``g_dc`` = the bank's DC response per channel,
    ``channelizer.dc_response``) — so the fused u8 bank kernel stays
    untouched and the correction costs O(C x n_if) elementwise instead
    of a raw-rate pass.  Returns planar components
    ``(a_r, a_i, b_r, b_i, k_r, k_i)``, batch-shaped like the coeffs.
    """
    a_r = (1.0 + c.s) * 0.5
    b_r = (1.0 - c.s) * 0.5
    ab_i = -0.5 * c.s * c.rho
    k_r = c.dc_i
    k_i = c.s * (c.dc_q - c.dc_i * c.rho)
    return a_r, ab_i, b_r, ab_i, k_r, k_i


def apply_channelized(y_i: Array, y_q: Array, c: IQCorrCoeffs,
                      g_r: Array, g_i: Array) -> tuple[Array, Array]:
    """Apply the pre-bank correction in the channel domain (see
    ``channel_affine``).  ``y_i``/``y_q``: [..., C, M] channelized
    streams; coeffs batch-shaped [...]; ``g_r``/``g_i``: [C] bank DC
    response.  Exactly equals correcting the wideband stream before the
    bank (steady state; pinned in tests/test_wideband_iqcorr.py)."""
    a_r0, a_i0, b_r0, b_i0, k_r0, k_i0 = channel_affine(c)
    a_r, a_i, b_r, b_i = (x[..., None, None]
                          for x in (a_r0, a_i0, b_r0, b_i0))
    # kappa * g_dc: [..., C] channel vector, then a trailing stream axis
    kg_r = (k_r0[..., None] * g_r - k_i0[..., None] * g_i)[..., :, None]
    kg_i = (k_r0[..., None] * g_i + k_i0[..., None] * g_r)[..., :, None]
    mirror = (-jnp.arange(y_i.shape[-2])) % y_i.shape[-2]
    ym_i = jnp.take(y_i, mirror, axis=-2)
    ym_q = -jnp.take(y_q, mirror, axis=-2)          # conj
    out_i = a_r * y_i - a_i * y_q + b_r * ym_i - b_i * ym_q - kg_r
    out_q = a_r * y_q + a_i * y_i + b_r * ym_q + b_i * ym_i - kg_i
    return out_i, out_q


def wideband_moments(wb_u8: Array, n_est: int = 4096) -> Array:
    """Conic-fit moments of the raw interleaved wideband u8 stream,
    estimated from a CONTIGUOUS prefix window of ``n_est`` complex
    samples, for the second-order ``coeffs_gaussian`` readout.

    Why a contiguous window and not a strided subsample: (a) a strided
    u8 gather is exactly the relayout access pattern this codebase's
    kernels exist to avoid — measured **-14.5%** on the wideband chain
    (2564 -> 2193 MS/s) vs free for the contiguous slice; (b) a stride
    with ``C | c*stride`` folds channel c's residual carrier line
    exactly onto DC where it phase-locks into a fake dc estimate
    (measured +0.04 at stride 16 / C=8) — a full-rate window has no
    such folding (every carrier rotates through ~n_est*c/C cycles and
    averages out).  The window is a fraction of one block; the EMA
    across blocks supplies the averaging."""
    w = wb_u8[..., :2 * n_est]
    pair = w.reshape(*w.shape[:-1], n_est, 2).astype(jnp.float32)
    i = (pair[..., 0] - 128.0) / 128.0
    q = (pair[..., 1] - 128.0) / 128.0
    return moments(i, q)


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
