"""Bounded-domain fused sin/cos for NCO synthesis.

The receiver's only bulk transcendental work is the NCO synthesis after
the PLL phase recurrence (`ops/pll.py`): cos/sin over the IF-rate phase
stream (reference: the per-sample cos/sin inside ``fmPLL``,
src/filter.cpp:196-216, hoisted out of the loop here).  XLA's generic
``jnp.cos``/``jnp.sin`` must handle the full f32 range and measure
~107 VPU lane-ops per sin+cos pair on TPU v5e — which made the NCO
stage the single largest non-front cost of the serving chain
(probe: the serving-shape PLL costs 21 ms for phases but 74 ms with
the three consumed NCOs, C=512 x 2 lanes x 48 blocks).

The PLL keeps its carried phases wrapped to [0, 4*pi) (``pll._WRAP``),
so the NCO arguments are *bounded*: |arg| <= 8*pi*max_scale + adjust
(< 64 for every receiver configuration).  That admits the classic
small-quotient Cody-Waite reduction + minimax kernel polynomials —
~36 lane-ops for the fused pair, ~3x cheaper than libm — at ~1-ulp
accuracy over the whole admissible domain (pinned in tests/test_trig.py
against float64 ground truth).

Domain contract: |x| <= BOUND (2048 radians).  Beyond that the
quotient ``q`` grows past the exact-product range of the Cody-Waite
constants and accuracy degrades gracefully (it does NOT wrap to
garbage until |x| ~ 2^23).  Callers with unbounded args must keep
using ``jnp.cos``/``jnp.sin``.

The quadrant-reduction constants are the single-precision Cephes
``sinf`` splits (2x the pi/4 set): PIO2_1 has a 7-bit mantissa and
PIO2_2 trailing zeros, so ``q * PIO2_k`` is exact for |q| < 2^16 and
the three-term subtraction loses nothing to rounding.  The kernel
polynomials are the Cephes single-precision minimax sets on
[-pi/4, pi/4].
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array

BOUND = 2048.0   # |x| up to this: ~1 ulp; see module docstring

_TWO_OVER_PI = np.float32(0.6366197723675814)
# pi/2 = PIO2_1 + PIO2_2 + PIO2_3 to ~1e-17 (Cephes DP1..3 * 2)
_PIO2_1 = np.float32(1.5703125)
_PIO2_2 = np.float32(4.837512969970703125e-4)
_PIO2_3 = np.float32(7.549789948768648e-8)

# Cephes single-precision kernels on [-pi/4, pi/4]
_S1 = np.float32(-1.6666654611e-1)
_S2 = np.float32(8.3321608736e-3)
_S3 = np.float32(-1.9515295891e-4)
_C1 = np.float32(4.166664568298827e-2)
_C2 = np.float32(-1.388731625493765e-3)
_C3 = np.float32(2.443315711809948e-5)


def sincos(x: Array) -> tuple[Array, Array]:
    """(sin x, cos x) for |x| <= BOUND, fused: the two outputs share the
    range reduction and the r^2 powers, so requesting both costs ~8 ops
    more than one (and XLA dead-code-eliminates the unused one when a
    caller drops it)."""
    x = jnp.asarray(x, jnp.float32)
    q = jnp.round(x * _TWO_OVER_PI)
    r = ((x - q * _PIO2_1) - q * _PIO2_2) - q * _PIO2_3
    m = q.astype(jnp.int32) & 3          # quadrant (two's complement mod)
    z = r * r
    s = r + r * z * (_S1 + z * (_S2 + z * _S3))
    c = 1.0 + z * (jnp.float32(-0.5) + z * (_C1 + z * (_C2 + z * _C3)))
    swap = (m & 1) == 1
    s_sel = jnp.where(swap, c, s)
    c_sel = jnp.where(swap, s, c)
    # sin(r + m*pi/2): m=0:s 1:c 2:-s 3:-c ; cos: m=0:c 1:-s 2:-c 3:s
    s_out = jnp.where(m >= 2, -s_sel, s_sel)
    c_out = jnp.where((m == 1) | (m == 2), -c_sel, c_sel)
    return s_out, c_out


def sin(x: Array) -> Array:
    return sincos(x)[0]


def cos(x: Array) -> Array:
    return sincos(x)[1]


def nco_sincos(x: Array) -> tuple[Array, Array]:
    """The NCO-synthesis trig used by ``pll.pll`` and the sharded
    replay (parallel/sharded.py) — ONE selector so the sequential and
    time-sharded paths stay bit-identical.  ``DY4TPU_NCO_TRIG=libm``
    restores ``jnp.sin``/``jnp.cos`` for A/B."""
    if os.environ.get("DY4TPU_NCO_TRIG", "poly") == "libm":
        return jnp.sin(x), jnp.cos(x)
    return sincos(x)
