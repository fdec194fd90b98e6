"""FM de-emphasis: the receiver-side single-pole IIR every broadcast
chain expects (75 us in the Americas/Korea, 50 us elsewhere).

Beyond-parity audio-fidelity stage — the reference pipeline stops at the
resampled audio (src/project.cpp:95-134 has no de-emphasis, so treble
mixed with the standard pre-emphasis TX curve comes out ~+17 dB hot at
15 kHz).  Real FM transmitters boost highs with a first-order zero at
1/(2*pi*tau); the receiver must undo it with the matching pole:

    y[n] = a * y[n-1] + (1 - a) * x[n],      a = exp(-1 / (tau * fs))

TPU mapping: a first-order linear recurrence is an associative scan over
affine maps (A, B) with (A1, B1) o (A2, B2) = (A1*A2, A2*B1 + B2) —
`lax.associative_scan` runs it in log2(n) vectorized passes, so the
whole block filters at VPU speed instead of a 1-sample/step scan.  The
carried state is one sample per stream (the previous output), a pytree
scalar that composes with the receiver's checkpoint/shard disciplines.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

#: standard time constants (seconds)
TAU_US_75 = 75e-6   # Americas / South Korea
TAU_EU_50 = 50e-6   # Europe / rest of world


def deemph_coeff(fs: float, tau: float = TAU_US_75) -> float:
    """Pole coefficient ``a`` for sample rate ``fs`` (impulse-invariant
    mapping of the analog RC pole; -3 dB at ~1/(2*pi*tau))."""
    return math.exp(-1.0 / (tau * fs))


def deemphasis_block(x: Array, y_prev: Array, a: float
                     ) -> tuple[Array, Array]:
    """Filter one block: ``y[n] = a*y[n-1] + (1-a)*x[n]``.

    ``x``: [..., n] audio block; ``y_prev``: [...] the previous block's
    last output (0 at stream start).  Returns ``(y, y_last)``.  Exact:
    block boundaries are invisible (pinned by test_deemph.py).
    """
    a = jnp.asarray(a, x.dtype)
    b = (1.0 - a) * x
    # fold the carried state into the first sample's offset term
    b = b.at[..., 0].add(a * y_prev)
    aa = jnp.broadcast_to(a, x.shape)

    def combine(l, r):
        (a1, b1), (a2, b2) = l, r
        return a1 * a2, a2 * b1 + b2

    _, y = lax.associative_scan(combine, (aa, b), axis=-1)
    return y, y[..., -1]


def init_deemph_state(batch: tuple[int, ...] = (), *, stereo: bool,
                      dtype=jnp.float32):
    """Carried state: previous output sample per audio stream —
    ``(mono,)`` or ``(left, right)``."""
    n = 2 if stereo else 1
    return tuple(jnp.zeros(batch, dtype) for _ in range(n))
