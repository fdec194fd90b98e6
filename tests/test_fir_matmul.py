"""The MXU Toeplitz-matmul FIR path must agree with the conv path.

CI runs on CPU where ``impl="auto"`` picks the conv lowering, so the
matmul path (the TPU hot path) is pinned here explicitly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dy4tpu.ops import fir

RNG = np.random.default_rng(3)

CASES = [
    # (n, k, up, down) — the receiver's real geometries + odd corners
    (7680, 101, 1, 1),        # band filters at IF rate
    (76800, 101, 1, 10),      # RF decimator
    (7680, 101, 1, 5),        # mode-0 audio
    (7680, 1919, 19, 120),    # mode-0 RDS resampler
    (1600, 101 * 147, 147, 800),   # mode-2 audio resampler
    (1280, 101 * 147, 147, 1280),  # mode-3 audio resampler
    (24, 19, 19, 24),         # tiny block, tile == m
    (40, 16, 3, 4),           # non-divisible tap/up ratio
    (256, 7, 1, 2),           # short filter
]


@pytest.mark.parametrize("n,k,up,down", CASES)
def test_matmul_matches_conv(n, k, up, down):
    x = RNG.standard_normal((2, n)).astype(np.float32)
    h = RNG.standard_normal(k).astype(np.float32)
    st = RNG.standard_normal((2, fir.state_len(k, up))).astype(np.float32)
    y1, s1 = fir.block_fir_resample(jnp.asarray(x), jnp.asarray(h),
                                    jnp.asarray(st), up=up, down=down,
                                    impl="conv")
    y2, s2 = fir.block_fir_resample(jnp.asarray(x), jnp.asarray(h),
                                    jnp.asarray(st), up=up, down=down,
                                    impl="matmul")
    scale = max(1.0, float(jnp.max(jnp.abs(y1))))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               atol=2e-4 * scale)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_matmul_bank_matches_conv():
    x = RNG.standard_normal((2, 7680)).astype(np.float32)
    hs = RNG.standard_normal((3, 101)).astype(np.float32)
    st = RNG.standard_normal((2, 3, 100)).astype(np.float32)
    y1, _ = fir.block_fir_bank(jnp.asarray(x), jnp.asarray(hs),
                               jnp.asarray(st), impl="conv")
    y2, _ = fir.block_fir_bank(jnp.asarray(x), jnp.asarray(hs),
                               jnp.asarray(st), impl="matmul")
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-4)


def test_matmul_streaming_state_continuity():
    """Two matmul-path blocks == one double-length block."""
    n, k, up, down = 1920, 1919, 19, 120
    x = RNG.standard_normal((2 * n,)).astype(np.float32)
    h = RNG.standard_normal(k).astype(np.float32)
    st0 = np.zeros(fir.state_len(k, up), np.float32)

    y_all, _ = fir.block_fir_resample(jnp.asarray(x), jnp.asarray(h),
                                      jnp.asarray(st0), up=up, down=down,
                                      impl="matmul")
    y1, s = fir.block_fir_resample(jnp.asarray(x[:n]), jnp.asarray(h),
                                   jnp.asarray(st0), up=up, down=down,
                                   impl="matmul")
    y2, _ = fir.block_fir_resample(jnp.asarray(x[n:]), jnp.asarray(h), s,
                                   up=up, down=down, impl="matmul")
    np.testing.assert_allclose(np.concatenate([y1, y2]), np.asarray(y_all),
                               atol=1e-4)
