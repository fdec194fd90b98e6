"""FM demodulators.

``fm_demod_diff`` is the arctan-free differentiator the reference runs in
real time (``fmDemodArctan`` src/filter.cpp:85-102, despite its name), fully
vectorised:

    fm[k] = (I[k]*(Q[k]-Q[k-1]) - Q[k]*(I[k]-I[k-1])) / (I[k]^2 + Q[k]^2)

with the previous block's last I/Q pair carried as state and a zero-power
guard mapping 0/0 to 0 (src/filter.cpp:88-92).

``fm_demod_arctan`` is the phase-unwrap variant from the Python support
library (``fmSupportLib.py:34-63``), expressed without a scan by computing
per-sample phases and a vectorised unwrap of the first differences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def fm_demod_diff(i: Array, q: Array, prev_i: Array, prev_q: Array
                  ) -> tuple[Array, Array, Array]:
    """Differentiator FM demod over a block.

    ``i``/``q``: [..., N]; ``prev_i``/``prev_q``: [...] scalars per stream.
    Returns ``(fm, new_prev_i, new_prev_q)``.
    """
    i_prev = jnp.concatenate([prev_i[..., None], i[..., :-1]], axis=-1)
    q_prev = jnp.concatenate([prev_q[..., None], q[..., :-1]], axis=-1)
    power = i * i + q * q
    num = i * (q - q_prev) - q * (i - i_prev)
    fm = jnp.where(power == 0, 0.0, num / jnp.where(power == 0, 1.0, power))
    return fm, i[..., -1], q[..., -1]


def fm_demod_arctan(i: Array, q: Array, prev_phase: Array
                    ) -> tuple[Array, Array]:
    """Phase-difference FM demod with unwrap (fmSupportLib.py:34-63).

    The reference unwraps each consecutive phase pair in a Python loop;
    the equivalent closed form is: wrap the first difference of atan2
    phases into (-pi, pi].
    """
    phase = jnp.arctan2(q, i)
    prev = jnp.concatenate([prev_phase[..., None], phase[..., :-1]], axis=-1)
    d = phase - prev
    # np.unwrap on a pair adjusts the 2nd element so |diff| <= pi
    d = jnp.mod(d + jnp.pi, 2 * jnp.pi) - jnp.pi
    return d, phase[..., -1]
