"""Automatic frequency control: residual-carrier tracking for IF inputs.

Beyond-parity subsystem (the reference assumes a perfectly tuned front
end, ``src/project.cpp:137-174``; real tuners/transmitters sit tens of
kHz off the channel grid): a per-channel first-order AFC loop that

1. rotates the IF-rate complex baseband by a carried NCO
   (``rotate``), and
2. integrates the FM discriminator's DC term into the frequency
   estimate (``update``) — for the quadrature differentiator
   ``(I*dQ - Q*dI)/(I^2+Q^2)`` (ops/demod.py, filter.cpp:85-102) the
   block mean IS the residual offset in rad/sample, because the
   demodulated multiplex (audio + pilot + DSB + RDS) is zero-mean over
   a 22-44 ms block.  The receiver's mono output is the audio LPF of
   that stream with unit DC gain, so ``mean(mono_block)`` is an
   equivalent (and already-computed) estimator — that is what the
   wideband pipeline feeds back.

Why it matters at the system level: a +60 kHz offset pushes the 57 kHz
RDS subcarrier to 117 kHz — against the 120 kHz edge of a 240 kS/s IF
channel — and parks the stereo DSB band on the channelizer's
transition band; the loop re-centres the multiplex in a few blocks
(alpha = 0.5 halves the error per block; see tests/test_afc.py for the
convergence + decode-recovery pins).

Everything is static-shaped, one ``AFCState`` pytree, jit/scan/
shard_map-safe — the same streaming-state discipline as the receiver
(SURVEY.md section 2.4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dy4tpu.ops import trig

Array = jax.Array

_TWO_PI = np.float32(2.0 * np.pi)
_INV_TWO_PI = np.float32(1.0 / (2.0 * np.pi))


class AFCState(NamedTuple):
    """Per-channel loop state (batch-shaped scalars)."""
    freq: Array    # residual-carrier estimate, rad per IF sample
    phase: Array   # NCO phase at the start of the next block, rad


def init_afc_state(batch: tuple[int, ...] = (),
                   dtype=jnp.float32) -> AFCState:
    z = jnp.zeros(batch, dtype)
    return AFCState(freq=z, phase=z)


def _wrap_pi(x: Array) -> Array:
    """Wrap to [-pi, pi].  f32 round-trip error is ~|x|*eps*2pi — the
    per-block phase argument below stays < 2^13 rad, so the wrap costs
    < 1e-3 rad, far below FM audibility (the demod differentiates, so a
    near-constant phase bias cancels)."""
    return x - _TWO_PI * jnp.round(x * _INV_TWO_PI)


def rotate(i_if: Array, q_if: Array, state: AFCState
           ) -> tuple[Array, Array, Array]:
    """De-rotate one IF block by the carried estimate:
    ``y = x * exp(-j*(phase + freq*k))``.

    ``i_if``/``q_if``: [..., N].  Returns ``(y_i, y_q, phase_next)``
    with ``phase_next`` wrapped so the NCO stays phase-continuous
    across blocks without unbounded growth."""
    n = i_if.shape[-1]
    k = jnp.arange(n, dtype=jnp.float32)
    theta = _wrap_pi(state.phase[..., None] + state.freq[..., None] * k)
    s, c = trig.sincos(theta)          # |theta| <= pi: in-domain
    y_i = i_if * c + q_if * s
    y_q = q_if * c - i_if * s
    phase_next = _wrap_pi(state.phase + state.freq * n)
    return y_i, y_q, phase_next


def update(state: AFCState, phase_next: Array, dc: Array,
           alpha: float = 0.5, max_freq: float | None = None,
           fs: float | None = None) -> AFCState:
    """One loop iteration from the block's discriminator DC term.

    ``dc``: batch-shaped mean of the demodulated stream (rad/sample) —
    the REMAINING offset after this block's rotation, so the loop is
    ``freq += alpha * dc``.  ``max_freq`` (Hz, with ``fs``) clamps the
    estimate to a capture range (e.g. half the channel spacing, beyond
    which the neighbour channel is the right place to look)."""
    freq = state.freq + jnp.float32(alpha) * dc
    if max_freq is not None:
        assert fs is not None, "max_freq needs fs"
        lim = jnp.float32(2.0 * np.pi * max_freq / fs)
        freq = jnp.clip(freq, -lim, lim)
    return AFCState(freq=freq, phase=phase_next)


def freq_hz(state: AFCState, fs: float) -> Array:
    """The tracked residual carrier offset in Hz (diagnostics/UI)."""
    return state.freq * jnp.float32(fs / (2.0 * np.pi))
