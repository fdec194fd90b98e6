"""Fourier transforms and Bartlett PSD estimation.

TPU-native equivalents of the reference Fourier family:
  * ``dft``/``idft`` — the O(N^2) transforms (src/fourier.cpp:14-22,92-101)
    expressed as a single complex matmul so they land on the MXU.
  * ``fft_radix2``/``ifft_radix2`` — iterative radix-2 DIT
    (src/fourier.cpp:189-211 ``FFT_optimized``) with the bit-reversal
    permutation precomputed at trace time and every butterfly level a
    vectorised VPU pass; no per-element loops.
  * ``estimate_psd`` — Hann-windowed Bartlett average in dB
    (src/fourier.cpp:35-88, fmSupportLib.py:86-161).

``NFFT = 512`` is the reference default (include/dy4.h:18).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array

NFFT = 512


def dft(x: Array) -> Array:
    """O(N^2) DFT as a complex matmul (src/fourier.cpp:14-22)."""
    n = x.shape[-1]
    k = np.arange(n)
    w = np.exp(-2j * np.pi * np.outer(k, k) / n).astype(np.complex64)
    return jnp.asarray(x, jnp.complex64) @ jnp.asarray(w)


def idft(xf: Array) -> Array:
    """O(N^2) inverse DFT (src/fourier.cpp:92-101)."""
    n = xf.shape[-1]
    k = np.arange(n)
    w = (np.exp(2j * np.pi * np.outer(k, k) / n) / n).astype(np.complex64)
    return jnp.asarray(xf, jnp.complex64) @ jnp.asarray(w)


@functools.cache
def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def fft_radix2(x: Array) -> Array:
    """Iterative radix-2 DIT FFT (src/fourier.cpp:189-211), vectorised.

    ``x``: [..., N] real or complex, N a power of two.
    """
    n = x.shape[-1]
    if n & (n - 1):
        raise ValueError(f"N={n} must be a power of two")
    x = jnp.asarray(x, jnp.complex64)
    out = x[..., _bit_reverse_indices(n)]
    s = 1
    while s < n:
        tw = jnp.asarray(
            np.exp(-2j * np.pi * np.arange(s) / (2 * s)).astype(np.complex64))
        v = out.reshape((*out.shape[:-1], n // (2 * s), 2, s))
        even, odd = v[..., 0, :], v[..., 1, :] * tw
        out = jnp.concatenate([even + odd, even - odd], axis=-1)
        out = out.reshape((*out.shape[:-2], n))
        s *= 2
    return out


def ifft_radix2(xf: Array) -> Array:
    """Inverse via conjugation of the forward radix-2 transform."""
    n = xf.shape[-1]
    return jnp.conj(fft_radix2(jnp.conj(xf))) / n


def hann_sq(n: int) -> np.ndarray:
    """The reference's sin^2 Hann window (src/fourier.cpp:47-49)."""
    i = np.arange(n)
    return (np.sin(i * np.pi / n) ** 2).astype(np.float32)


def estimate_psd(samples: Array, nfft: int = NFFT, fs: float = 1.0,
                 impl: str = "auto") -> tuple[np.ndarray, Array]:
    """Bartlett PSD estimate in dB (src/fourier.cpp:35-88).

    ``samples``: [..., M] with M >= nfft; trailing partial segment dropped.
    Returns ``(freq[nfft/2], psd[..., nfft/2])``.

    ``impl`` selects the segment transform: "pallas" (the in-house
    four-step MXU kernel, ops/fft_pallas.py — the C12 inventory item),
    "four_step" (same algorithm as XLA einsums), "jnp" (jnp.fft.fft),
    or "auto" (pallas on TPU, jnp elsewhere).
    """
    m = samples.shape[-1]
    segs = m // nfft
    freq = np.arange(nfft // 2) * (fs / nfft)
    x = samples[..., :segs * nfft].reshape(
        (*samples.shape[:-1], segs, nfft)) * jnp.asarray(hann_sq(nfft))
    if impl == "auto":
        # measured on v5e (benchmarks/micro_fft.py, 4096x512 chained):
        # pallas 2.27 ms / four_step-XLA 2.53 / jnp.fft 45.2 — the MXU
        # four-step beats the generic FFT lowering 20x at PSD shapes
        from dy4tpu.ops import fft_pallas
        if jax.default_backend() == "tpu":
            impl = ("pallas" if fft_pallas.pallas_supported(nfft)
                    else "four_step")
        else:
            impl = "jnp"
    # jitted (cached per impl/nfft/fs/shape): the tunnel's eager
    # dispatch path cannot run pallas_call or fetch complex arrays,
    # and psdview/logging call this outside any jit
    return freq, _psd_segments(x, nfft, float(fs), impl)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _psd_segments(x: Array, nfft: int, fs: float, impl: str) -> Array:
    if impl == "pallas":
        from dy4tpu.ops import fft_pallas
        xf = fft_pallas.fft_pallas(x)[..., : nfft // 2]
    elif impl == "four_step":
        from dy4tpu.ops import fft_pallas
        xf = fft_pallas.fft_four_step(x)[..., : nfft // 2]
    else:
        xf = jnp.fft.fft(x, axis=-1)[..., : nfft // 2]
    psd = (2.0 / (fs * nfft / 2.0)) * jnp.abs(xf) ** 2
    psd_db = 10.0 * jnp.log10(psd)
    return jnp.mean(psd_db, axis=-2)


def vector_magnitude(xf: Array) -> Array:
    """|X|/N (src/fourier.cpp:25-32)."""
    return jnp.abs(xf) / xf.shape[-1]
