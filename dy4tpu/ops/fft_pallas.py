"""Pallas four-step (Bailey) FFT — the TPU-native radix decomposition.

Closes the SURVEY §7 / VERDICT r2 item 7 "Pallas radix-2 FFT" inventory
item (reference family: src/fourier.cpp:103-211).  A literal radix-2
butterfly network is the WRONG shape for this hardware: log2(N) stages
of stride-2^s lane shuffles serialize on the VPU's cross-lane network.
The four-step decomposition N = N1 x N2 instead lowers the transform to
one small unrolled stage plus one MXU matmul with an elementwise
twiddle between:

    X[k1 + N1*k2] = sum_n2 W_N2^(n2 k2) * W_N^(n2 k1)
                    * sum_n1 x[n1*N2 + n2] * W_N1^(n1 k1)

Mosaic lowering constraints shape the kernel (the first cut used
``vector.reshape (8,512)->(8,16,32)`` 3-D reshapes inside the kernel
and failed infer-vector-layout on real TPU — measured, round 3):

* N2 = min(N, 128) so the inner axis is exactly one lane tile; the
  N2-point DFT is a [N1*BC, 128] x [128, 128] complex MXU matmul.
* The N1-point first stage is unrolled with *compile-time scalar*
  twiddles (N1 <= 16 gated by ``pallas_supported``): N1^2 fused
  scalar-multiply-adds on [BC, 128] tiles — pure VPU, zero cross-lane
  traffic, no in-kernel reshapes or transposes at all.
* Refs are [N1, BC, N2]; the (cheap) [B, N] <-> [N1, B, N2] relayouts
  run in XLA outside the kernel where the compiler schedules them.

``fft_four_step`` is the same algorithm as a plain XLA composition
(two einsums) — the A/B candidate and the CPU path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_MAX_N1 = 16          # first-stage unroll bound (N <= 2048 on pallas)


@functools.cache
def _factor(n: int) -> tuple[int, int]:
    if n & (n - 1) or n < 4:
        raise ValueError(f"N={n} must be a power of two >= 4")
    n2 = min(n, 128)                         # one lane tile
    n1 = n // n2
    if n1 > n2:
        raise ValueError(f"N={n} too large (N1={n1} > N2={n2})")
    return n1, n2


def pallas_supported(n: int) -> bool:
    try:
        n1, _ = _factor(n)
    except ValueError:
        return False
    return n1 <= _MAX_N1


@functools.cache
def _consts(n: int):
    n1, n2 = _factor(n)
    f1 = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    f2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n)
    c64 = lambda a: a.astype(np.complex64)  # noqa: E731
    return c64(f1), c64(f2), c64(tw)        # F1, F2, TW[k1, n2]


def _kernel(xr_ref, xi_ref, twr_ref, twi_ref, f2r_ref, f2i_ref,
            outr_ref, outi_ref, gr_s, gi_s, *, n1: int, bc: int,
            f1r: tuple, f1i: tuple):
    prec = jax.lax.Precision.HIGHEST
    # stage 1: N1-point DFT across the leading ref axis, unrolled with
    # compile-time scalar twiddles, then the elementwise twiddle --
    # accumulate straight into the [N1*BC, N2] scratch rows
    for k1 in range(n1):
        gr = gi = 0.0
        for m in range(n1):
            ar, ai = xr_ref[m], xi_ref[m]
            cr, ci = f1r[k1][m], f1i[k1][m]
            gr += cr * ar - ci * ai
            gi += cr * ai + ci * ar
        twr, twi = twr_ref[k1], twi_ref[k1]      # [1, N2] row broadcast
        gr_s[k1 * bc:(k1 + 1) * bc] = gr * twr - gi * twi
        gi_s[k1 * bc:(k1 + 1) * bc] = gr * twi + gi * twr
    # stage 2: N2-point DFT = one complex MXU matmul over all rows
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32,  # noqa: E731
                             precision=prec)
    hr, hi = gr_s[:], gi_s[:]
    yr = d(hr, f2r_ref[:]) - d(hi, f2i_ref[:])
    yi = d(hr, f2i_ref[:]) + d(hi, f2r_ref[:])
    for k1 in range(n1):
        outr_ref[k1] = yr[k1 * bc:(k1 + 1) * bc]
        outi_ref[k1] = yi[k1 * bc:(k1 + 1) * bc]


def fft_pallas(x: Array, *, interpret: bool = False) -> Array:
    """Batched FFT over the last axis via the four-step Pallas kernel.

    ``x``: [..., N] real or complex, N a power of two with
    ``pallas_supported(N)`` (N <= 2048).  Returns complex64 like
    ``jnp.fft.fft``.
    """
    n = x.shape[-1]
    n1, n2 = _factor(n)
    if n1 > _MAX_N1:
        raise ValueError(f"N={n}: first-stage unroll bound is "
                         f"{_MAX_N1} (use fft_four_step)")
    f1, f2, tw = _consts(n)
    f1r = tuple(tuple(float(v) for v in row) for row in f1.real)
    f1i = tuple(tuple(float(v) for v in row) for row in f1.imag)

    x = jnp.asarray(x)
    xr = jnp.real(x).astype(jnp.float32).reshape(-1, n)
    xi = (jnp.imag(x).astype(jnp.float32).reshape(-1, n)
          if jnp.iscomplexobj(x) else jnp.zeros_like(xr))
    b = xr.shape[0]
    bc = max(8, 128 // n1)                  # rows per grid step
    b_pad = -(-b // bc) * bc
    if b_pad != b:
        xr = jnp.pad(xr, ((0, b_pad - b), (0, 0)))
        xi = jnp.pad(xi, ((0, b_pad - b), (0, 0)))
    # [B, N] -> [N1, B, N2]: row b's segment n1 lands at [n1, b, :]
    to3 = lambda a: jnp.swapaxes(a.reshape(b_pad, n1, n2), 0, 1)  # noqa: E731
    x3r, x3i = to3(xr), to3(xi)

    planar = lambda a, shp: (jnp.asarray(a.real, jnp.float32).reshape(shp),  # noqa: E731
                             jnp.asarray(a.imag, jnp.float32).reshape(shp))
    twr, twi = planar(tw, (n1, 1, n2))
    f2r, f2i = planar(f2, (n2, n2))

    kern = functools.partial(_kernel, n1=n1, bc=bc, f1r=f1r, f1i=f1i)
    blk = lambda: pl.BlockSpec((n1, bc, n2), lambda i: (0, i, 0))  # noqa: E731
    cst = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)  # noqa: E731
    outr, outi = pl.pallas_call(
        kern, grid=(b_pad // bc,),
        in_specs=[blk(), blk(), cst(twr), cst(twi), cst(f2r), cst(f2i)],
        out_specs=[blk(), blk()],
        out_shape=[jax.ShapeDtypeStruct((n1, b_pad, n2), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((n1 * bc, n2), jnp.float32)
                        for _ in range(2)],
        interpret=interpret,
    )(x3r, x3i, twr, twi, f2r, f2i)
    y = outr[:, :b] + 1j * outi[:, :b]      # [N1, B, N2] = [k1, b, k2]
    # X[b, k1 + N1*k2] <-> [B, N2, N1] row-major
    out = jnp.transpose(y, (1, 2, 0)).reshape(b, n).astype(jnp.complex64)
    return out.reshape((*x.shape[:-1], n))


def fft_four_step(x: Array) -> Array:
    """The same four-step algorithm as plain XLA ops (two einsums) —
    the A/B reference for the kernel and the non-TPU lowering."""
    n = x.shape[-1]
    n1, n2 = _factor(n)
    f1, f2, tw = _consts(n)
    a = jnp.asarray(x, jnp.complex64).reshape(*x.shape[:-1], n1, n2)
    g = jnp.einsum("kn,...nm->...km", jnp.asarray(f1), a)
    y = jnp.einsum("...km,mj->...kj", g * jnp.asarray(tw), jnp.asarray(f2))
    return jnp.swapaxes(y, -1, -2).reshape(*x.shape[:-1], n)
