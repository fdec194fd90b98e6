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
