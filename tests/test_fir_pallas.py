"""Pallas decimating-FIR kernel vs the conv lowering (interpret mode).

On CPU the kernel runs through the Pallas interpreter, pinning numerics
and the grid/DMA indexing; TPU execution is exercised by the benchmark.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dy4tpu.ops import fir, fir_pallas

RNG = np.random.default_rng(5)

CASES = [
    ((2, 2), 76800, 101, 10),   # RF front end geometry (I/Q pairs batched)
    ((3,), 640, 101, 5),        # mode-0 audio decimation geometry
    ((), 1280, 7, 2),           # short filter, no batch dims
    ((5,), 256, 33, 4),         # tile-boundary output count (64 < 128)
]


@pytest.mark.parametrize("bshape,n,k,d", CASES)
def test_pallas_matches_conv(bshape, n, k, d):
    x = RNG.standard_normal((*bshape, n)).astype(np.float32)
    h = RNG.standard_normal(k).astype(np.float32)
    st = RNG.standard_normal((*bshape, k - 1)).astype(np.float32)
    y1, s1 = fir.block_fir_decim(jnp.asarray(x), jnp.asarray(h),
                                 jnp.asarray(st), d, impl="conv")
    y2, s2 = fir_pallas.block_fir_decim_pallas(
        jnp.asarray(x), jnp.asarray(h), jnp.asarray(st), d, interpret=True)
    scale = max(1.0, float(jnp.max(jnp.abs(y1))))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               atol=2e-4 * scale)
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s1))


def test_pallas_streaming_continuity():
    n, k, d = 2560, 101, 10
    x = RNG.standard_normal((2 * n,)).astype(np.float32)
    h = RNG.standard_normal(k).astype(np.float32)
    st0 = np.zeros(k - 1, np.float32)
    y_all, _ = fir_pallas.block_fir_decim_pallas(
        jnp.asarray(x), jnp.asarray(h), jnp.asarray(st0), d, interpret=True)
    y1, s = fir_pallas.block_fir_decim_pallas(
        jnp.asarray(x[:n]), jnp.asarray(h), jnp.asarray(st0), d,
        interpret=True)
    y2, _ = fir_pallas.block_fir_decim_pallas(
        jnp.asarray(x[n:]), jnp.asarray(h), s, d, interpret=True)
    np.testing.assert_allclose(np.concatenate([y1, y2]), np.asarray(y_all),
                               atol=1e-5)
