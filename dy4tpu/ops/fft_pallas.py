"""Pallas four-step (Bailey) FFT — the TPU-native radix decomposition.

Closes the SURVEY §7 / VERDICT r2 item 7 "Pallas radix-2 FFT" inventory
item (reference family: src/fourier.cpp:103-211).  A literal radix-2
butterfly network is the WRONG shape for this hardware: log2(N) stages
of stride-2^s lane shuffles serialize on the VPU's cross-lane network.
The four-step decomposition N = N1 x N2 instead lowers the transform to
two small complex MATMULS (MXU) with one elementwise twiddle between:

    X[k1 + N1*k2] = sum_n2 W_N2^(n2 k2) * W_N^(n2 k1)
                    * sum_n1 x[n1*N2 + n2] * W_N1^(n1 k1)

i.e.  A = x.reshape(N1, N2);  G = F1^T A;  H = G * TW;  Y = H F2;
      X = Y^T.ravel()

The kernel keeps A/G/H/Y in VMEM as planar real/imag f32 pairs (Mosaic
has no complex type), pays two in-register transposes to keep both
contractions on the minor axis, and batches segments on the sublane
axis.  Factors are chosen so N1, N2 <= 128 (one lane tile each);
NFFT=512 -> 16 x 32.

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

_BC = 8


@functools.cache
def _factor(n: int) -> tuple[int, int]:
    if n & (n - 1) or n < 4:
        raise ValueError(f"N={n} must be a power of two >= 4")
    n1 = 1 << (n.bit_length() - 1) // 2      # floor(log2(n)/2)
    n2 = n // n1
    assert n1 <= 128 and n2 <= 128, (n1, n2, "N too large for one tile")
    return n1, n2


@functools.cache
def _consts(n: int):
    n1, n2 = _factor(n)
    f1t = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    f2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n)
    c64 = lambda a: a.astype(np.complex64)  # noqa: E731
    return c64(f1t.T), c64(f2), c64(tw)     # F1^T, F2, TW[k1, n2]


def _kernel(xr_ref, xi_ref, f1r_ref, f1i_ref, twr_ref, twi_ref,
            f2r_ref, f2i_ref, outr_ref, outi_ref, *, n1: int, n2: int):
    bc = xr_ref.shape[0]
    prec = jax.lax.Precision.HIGHEST

    def cdot(ar, ai, br, bi):
        d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32,  # noqa: E731
                                 precision=prec)
        return d(ar, br) - d(ai, bi), d(ar, bi) + d(ai, br)

    # [bc, N] rows are (b); reshape to [bc, N1, N2] then expose n1 as the
    # contraction (minor-axis) dim via one transpose: [N1, bc*N2]
    to2 = lambda r: jnp.swapaxes(  # noqa: E731
        r[:].reshape(bc, n1, n2), 0, 1).reshape(n1, bc * n2)
    ar, ai = to2(xr_ref), to2(xi_ref)
    gr, gi = cdot(f1r_ref[:], f1i_ref[:], ar, ai)        # [k1, bc*N2]
    hr = gr * twr_ref[:] - gi * twi_ref[:]               # tiled twiddle
    hi = gr * twi_ref[:] + gi * twr_ref[:]
    back = lambda r: jnp.swapaxes(  # noqa: E731
        r.reshape(n1, bc, n2), 0, 1).reshape(bc * n1, n2)
    yr, yi = cdot(back(hr), back(hi), f2r_ref[:], f2i_ref[:])
    # Y rows are (b, k1), cols k2; X[k1 + N1*k2] -> [k2, k1] row-major
    fin = lambda r: jnp.swapaxes(  # noqa: E731
        r.reshape(bc, n1, n2), 1, 2).reshape(bc, n1 * n2)
    outr_ref[:] = fin(yr)
    outi_ref[:] = fin(yi)


def fft_pallas(x: Array, *, interpret: bool = False) -> Array:
    """Batched FFT over the last axis via the four-step Pallas kernel.

    ``x``: [..., N] real or complex, N a power of two with both factors
    <= 128 (N <= 16384).  Returns complex64 like ``jnp.fft.fft``.
    """
    n = x.shape[-1]
    n1, n2 = _factor(n)
    f1t, f2, tw = _consts(n)
    x = jnp.asarray(x)
    xr = jnp.real(x).astype(jnp.float32).reshape(-1, n)
    xi = (jnp.imag(x).astype(jnp.float32).reshape(-1, n)
          if jnp.iscomplexobj(x) else jnp.zeros_like(xr))
    b = xr.shape[0]
    b_pad = -(-b // _BC) * _BC
    if b_pad != b:
        xr = jnp.pad(xr, ((0, b_pad - b), (0, 0)))
        xi = jnp.pad(xi, ((0, b_pad - b), (0, 0)))

    tw_tiled = np.tile(tw, (1, _BC))                     # [N1, BC*N2]
    planar = lambda a: (jnp.asarray(a.real, jnp.float32),  # noqa: E731
                        jnp.asarray(a.imag, jnp.float32))
    f1r, f1i = planar(f1t)
    twr, twi = planar(tw_tiled)
    f2r, f2i = planar(f2)

    kern = functools.partial(_kernel, n1=n1, n2=n2)
    row = lambda: pl.BlockSpec((_BC, n), lambda i: (i, 0))  # noqa: E731
    cst = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))  # noqa: E731
    outr, outi = pl.pallas_call(
        kern, grid=(b_pad // _BC,),
        in_specs=[row(), row(), cst(f1r), cst(f1i), cst(twr), cst(twi),
                  cst(f2r), cst(f2i)],
        out_specs=[row(), row()],
        out_shape=[jax.ShapeDtypeStruct((b_pad, n), jnp.float32)] * 2,
        interpret=interpret,
    )(xr, xi, f1r, f1i, twr, twi, f2r, f2i)
    out = (outr[:b] + 1j * outi[:b]).astype(jnp.complex64)
    return out.reshape((*x.shape[:-1], n))


def fft_four_step(x: Array) -> Array:
    """The same four-step algorithm as plain XLA ops (two einsums) —
    the A/B reference for the kernel and the non-TPU lowering."""
    n = x.shape[-1]
    n1, n2 = _factor(n)
    f1t, f2, tw = _consts(n)
    a = jnp.asarray(x, jnp.complex64).reshape(*x.shape[:-1], n1, n2)
    g = jnp.einsum("kn,...nm->...km", jnp.asarray(f1t), a)
    y = jnp.einsum("...km,mj->...kj", g * jnp.asarray(tw), jnp.asarray(f2))
    return jnp.swapaxes(y, -1, -2).reshape(*x.shape[:-1], n)
