"""Pallas PLL phase-scan kernel vs the XLA lax.scan path.

The bar here is BIT equality, not tolerance: the kernel body is the same
``pll._make_step`` closure the scan traces, so outputs and carried state
must match exactly (the exact time-sharded receiver depends on this).
On CPU the kernel runs through the Pallas interpreter; TPU execution is
cross-checked by bench.py's self-validation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dy4tpu.ops import pll

RNG = np.random.default_rng(11)

# (batch shape, N) — stacked 2-lane serving shape, odd batch that needs
# padding, scalar-config no-batch shape, chunked long stream
CASES = [
    ((4, 2), 960),
    ((3,), 640),
    ((), 256),
    ((5, 2), 3 * 1024),
]


def _run(x, st, impl, **kw):
    return pll.pll(jnp.asarray(x), st, impl=impl, **kw)


@pytest.mark.parametrize("bshape,n", CASES)
def test_pallas_bit_equals_scan(bshape, n):
    x = RNG.standard_normal((*bshape, n)).astype(np.float32)
    # exact zeros exercise the zero-input guard branch
    x[..., 7] = 0.0
    st = pll.init_state(bshape)
    kw = dict(freq=19e3, fs=240e3, nco_scale=2.0, norm_bandwidth=0.01)
    if bshape and bshape[-1] == 2:
        kw = dict(freq=np.array([19e3, 114e3], np.float32), fs=240e3,
                  nco_scale=np.array([2.0, 0.5], np.float32),
                  norm_bandwidth=np.array([0.01, 0.001], np.float32))
    ia, qa, sa = _run(x, st, "scan", **kw)
    ib, qb, sb = _run(x, st, "pallas", **kw)
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(ia))
    np.testing.assert_array_equal(np.asarray(qb), np.asarray(qa))
    for f in sa._fields:
        np.testing.assert_array_equal(np.asarray(getattr(sb, f)),
                                      np.asarray(getattr(sa, f)), err_msg=f)


def test_pallas_coded_bit_equals_scan():
    """Coded replay (exact-sharded path): INVALID freeze + split carry."""
    c, lanes, n_if = 3, 2, 256
    o, total = 1, 5                      # 1 warm-up block + 4 live blocks
    x = RNG.standard_normal((c, lanes, total * n_if)).astype(np.float32)
    x[..., :40] = 0.0
    codes = np.array(pll.encode_sign(jnp.asarray(x)))
    codes[..., :n_if // 2] = pll.CODE_INVALID    # pre-stream padding
    carry = (jnp.zeros((c, lanes)), jnp.zeros((c, lanes)),
             jnp.zeros((c, lanes)))
    kw = dict(freq=np.array([19e3, 114e3], np.float32), fs=240e3,
              norm_bandwidth=np.array([0.01, 0.001], np.float32),
              split_at=(total - o) * n_if)
    pa, ma, ea = pll.phase_scan_coded(jnp.asarray(codes), carry,
                                      impl="scan", **kw)
    pb, mb, eb = pll.phase_scan_coded(jnp.asarray(codes), carry,
                                      impl="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(pb), np.asarray(pa))
    for u, v in zip(ma, mb):
        np.testing.assert_array_equal(np.asarray(v), np.asarray(u))
    for u, v in zip(ea, eb):
        np.testing.assert_array_equal(np.asarray(v), np.asarray(u))


def test_pallas_streaming_continuity():
    """Two chained pallas blocks == one scan over the concatenation."""
    n = 512
    x = RNG.standard_normal((2, 2 * n)).astype(np.float32)
    st0 = pll.init_state((2,))
    kw = dict(freq=19e3, fs=240e3, nco_scale=2.0, norm_bandwidth=0.01)
    i_all, _, _ = _run(x, st0, "scan", **kw)
    i1, _, s = _run(x[:, :n], st0, "pallas", **kw)
    i2, _, _ = _run(x[:, n:], s, "pallas", **kw)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(i1), np.asarray(i2)], axis=-1),
        np.asarray(i_all))
