"""Pointwise mixers, stereo matrix, delay line and quantisation.

Equivalents of src/filter.cpp:229-301 (delayBlock, pointwiseMultiply/Add/
Subtract, interleave) and the output quantiser (project.cpp:313-316).
All trivially fused by XLA; they exist as named ops for parity and tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def delay_block(x: Array, state: Array) -> tuple[Array, Array]:
    """All-pass delay by ``len(state)`` samples (src/filter.cpp:229-251).

    Used to phase-match the mono path against the (num_taps-1)/2 group
    delay of the stereo/RDS band-pass filters (project.pdf p.11-12).
    """
    d = state.shape[-1]
    out = jnp.concatenate([state, x[..., :-d]], axis=-1)
    return out, x[..., -d:]


def mix(a: Array, b: Array, gain: float = 2.0) -> Array:
    """Pointwise product with mixer gain (src/filter.cpp:253-266; the x2
    recovers the DSB-SC amplitude loss)."""
    return a * b * gain


def stereo_matrix(mono: Array, stereo: Array) -> tuple[Array, Array]:
    """L = M+S, R = M-S (src/filter.cpp:267-290)."""
    return mono + stereo, mono - stereo


def interleave(left: Array, right: Array) -> Array:
    """Interleave L/R into a 2-channel stream (src/filter.cpp:291-301)."""
    return jnp.stack([left, right], axis=-1).reshape(
        (*left.shape[:-1], left.shape[-1] * 2))


def quantize_s16(x: Array, scale: float = 16384.0) -> Array:
    """NaN-guarded float -> s16 PCM (project.cpp:313-316)."""
    x = jnp.where(jnp.isnan(x), 0.0, x)
    return (x * scale).astype(jnp.int16)


def squaring_nonlinearity(x: Array) -> Array:
    """x^2 carrier-recovery nonlinearity for RDS (fmMonoBlock.py:405-409)."""
    return x * x


def stereo_blend(left: Array, right: Array, pilot_snr_db: Array,
                 full_db: float = 14.0, mono_db: float = 4.0
                 ) -> tuple[Array, Array]:
    """Weak-signal stereo->mono blend (beyond-parity; standard receiver
    behaviour — the reference always emits full stereo separation).

    The stereo difference channel rides a DSB-SC subcarrier with ~20 dB
    worse post-demod SNR than the mono sum, so real receivers fade S
    out as the signal weakens instead of playing hiss in stereo.  The
    per-block gain comes from the receiver's pilot-lock SNR estimate
    (StepOutputs.pilot_snr_db): g=1 at ``full_db`` and above, g=0 at
    ``mono_db`` and below, linear in dB between.  Applied post-matrix:
    L' = M + g*S, R' = M - g*S with M=(L+R)/2, S=(L-R)/2 — so it
    composes with any back end (stock or fused) without touching the
    kernels."""
    g = jnp.clip((pilot_snr_db - mono_db) / (full_db - mono_db),
                 0.0, 1.0)[..., None]
    m = 0.5 * (left + right)
    s = 0.5 * (left - right)
    return m + g * s, m - g * s
