"""Polyphase DFT filter bank: one wideband capture -> C station channels.

Beyond-parity component (the reference receives ONE pre-tuned station per
stream, `src/project.cpp:137-174`): real SDR deployments capture a wide
band (e.g. the whole 88-108 MHz FM allocation) and channelize it into
per-station complex baseband streams.  This op turns a wideband complex
IQ stream at ``fs_w = C * f_if`` into C critically-sampled channels at
``f_if`` each, centered on the uniform carrier grid ``+c * fs_w / C`` —
ready to feed ``pipeline.receiver.receiver_step_if`` (FM demod onward),
with the channel axis landing on the receiver's existing batch axis.

Math (standard DFT filter bank; h = prototype LPF, K = C*T taps):

    y_c[m] = sum_k h[k] x[mC - k] e^{-j 2pi c (mC - k) / C}
           = sum_{r<C} e^{+j 2pi c r / C} * w_r[m],
      w_r[m] = sum_{q<T} h[qC + r] x[(m-q)C - r]

i.e. C polyphase branch FIRs (T taps each) followed by a length-C DFT
across the branch index per output step.  TPU mapping:

* the branch signals come out of ONE reshape + flip of the extended
  block (`ext[:(M+T-1)C].reshape(M+T-1, C)` -- branch r is column
  C-1-r): zero gathers, zero relayout beyond a [.., M+T-1, C]
  transpose XLA handles;
* the branch FIRs are T fused multiply-adds of [C, M] tiles (T ~ 8-16);
* the DFT is a [C, C] x [C, M] complex matmul -- one MXU tile for
  C <= 128 (the same four-step trick as ops/fft_pallas.py stage 2).

Critically sampled: channel spacing == output rate == f_if.  Energy
beyond +-f_if/2 of a carrier aliases into the neighbour -- fine for FM
broadcast (station spacing >= 200 kHz, multiplex ~ +-100 kHz); an
oversampled (x2) bank is the standard extension if ever needed.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from dy4tpu.ops import firdes

Array = jax.Array


class ChannelizerParams(NamedTuple):
    """Static design: prototype taps + derived branch/DFT matrices."""
    h: Array          # [K] prototype LPF (K = C*T)
    p: Array          # [C, T] polyphase branches: p[r, q] = h[qC + r]
    e_r: Array        # [C, C] DFT real part,  E[c, r] = cos(2pi c r / C)
    e_i: Array        # [C, C] DFT imag part,  E[c, r] = sin(2pi c r / C)

    @property
    def channels(self) -> int:
        return self.p.shape[0]

    @property
    def taps_per_branch(self) -> int:
        return self.p.shape[1]


class ChannelizerState(NamedTuple):
    """Carried wideband tail (last K-1 complex input samples, planar)."""
    tail_i: Array     # [..., K-1]
    tail_q: Array     # [..., K-1]


def make_channelizer(channels: int, f_if: float, *,
                     taps_per_branch: int = 12,
                     fc: float | None = None) -> ChannelizerParams:
    """Design a C-channel critically-sampled bank for ``fs_w = C*f_if``.

    ``fc``: prototype cutoff (default ``0.42 * f_if`` — passes the FM
    multiplex, ~-60 dB by the adjacent carrier with T=12).
    """
    c, t = channels, taps_per_branch
    fs_w = c * f_if
    if fc is None:
        fc = 0.42 * f_if
    h = firdes.lpf(fs_w, fc, c * t)
    p = h.reshape(t, c).T                             # p[r, q] = h[qC+r]
    grid = 2.0 * np.pi * np.outer(np.arange(c), np.arange(c)) / c
    return ChannelizerParams(
        h=jnp.asarray(h, jnp.float32),
        p=jnp.asarray(np.ascontiguousarray(p), jnp.float32),
        e_r=jnp.asarray(np.cos(grid), jnp.float32),
        e_i=jnp.asarray(np.sin(grid), jnp.float32),
    )


def init_channelizer_state(params: ChannelizerParams,
                           batch: tuple[int, ...] = (),
                           dtype=jnp.float32) -> ChannelizerState:
    k = params.h.shape[0]
    z = jnp.zeros((*batch, k - 1), dtype)
    return ChannelizerState(tail_i=z, tail_q=z)


def channelize_block(params: ChannelizerParams, state: ChannelizerState,
                     x_i: Array, x_q: Array, *,
                     precision=jax.lax.Precision.HIGHEST
                     ) -> tuple[tuple[Array, Array], ChannelizerState]:
    """One block of wideband complex baseband -> C channel blocks.

    ``x_i``/``x_q``: [..., n_w] with ``C | n_w``.  Returns
    ``((y_i, y_q), new_state)`` with y_* shaped [..., C, n_w // C] —
    channel c is the band around carrier ``+c * fs_w / C`` (negative
    offsets alias to ``C - c``), downconverted and decimated to f_if.
    """
    c, t = params.channels, params.taps_per_branch
    k = c * t
    n_w = x_i.shape[-1]
    assert n_w % c == 0, (n_w, c)
    m = n_w // c

    def branches(x, tail):
        ext = jnp.concatenate([tail, x], axis=-1)       # [..., n_w+K-1]
        seg = ext[..., : (m + t - 1) * c]
        seg = seg.reshape(*seg.shape[:-1], m + t - 1, c)
        # u[r, mm] = ext[mm*C + C-1 - r] = x[(mm-(T-1))*C - r] zero-based
        u = jnp.swapaxes(jnp.flip(seg, -1), -1, -2)     # [..., C, M+T-1]
        w = jnp.zeros((*u.shape[:-1], m), u.dtype)
        for q in range(t):                              # T fused MACs
            w = w + params.p[:, q, None] * u[..., t - 1 - q: t - 1 - q + m]
        return w, ext[..., -(k - 1):]

    w_i, tail_i = branches(x_i, state.tail_i)
    w_q, tail_q = branches(x_q, state.tail_q)

    # complex DFT across branches: y = E @ w, E = exp(+j 2pi c r / C)
    dot = lambda a, b: jnp.einsum(  # noqa: E731
        "cr,...rm->...cm", a, b, precision=precision)
    y_i = dot(params.e_r, w_i) - dot(params.e_i, w_q)
    y_q = dot(params.e_r, w_q) + dot(params.e_i, w_i)
    return (y_i, y_q), ChannelizerState(tail_i=tail_i, tail_q=tail_q)


def channelize_block_interleaved(params: ChannelizerParams,
                                 state: ChannelizerState, x: Array, *,
                                 precision=jax.lax.Precision.HIGHEST
                                 ) -> tuple[tuple[Array, Array],
                                            ChannelizerState]:
    """`channelize_block` consuming INTERLEAVED f32 IQ — no deinterleave.

    ``x``: [..., 2*n_w] normalized f32, I even / Q odd (the u8 stream
    contract, iofunc.cpp:113-120, already cast).  Bit-identical math to
    the planar form (same MACs, same contraction), but the I/Q pair
    axis rides THROUGH the branch FIR (taps are per-branch, so each
    interleaved column just repeats its branch's tap) and the DFT
    contracts over the widened 2C branch-pair axis with
    ``G_i/G_q[c, 2r+p]`` built from E — so the stride-2 deinterleave
    relayout (measured ~1.7 ms/step at 32x[16ch] blocks on v5e, i.e.
    ~2x the whole channelizer) never happens.
    """
    c, t = params.channels, params.taps_per_branch
    k = c * t
    n2 = x.shape[-1]
    assert n2 % (2 * c) == 0, (n2, c)
    m = n2 // (2 * c)

    # interleave the carried planar tails (K-1 complex samples — tiny)
    tail = jnp.stack([state.tail_i, state.tail_q], axis=-1)
    tail = tail.reshape(*tail.shape[:-2], 2 * (k - 1))
    ext = jnp.concatenate([tail, x], axis=-1)          # [.., 2(n_w+K-1)]
    seg = ext[..., : (m + t - 1) * 2 * c]
    seg = seg.reshape(*seg.shape[:-1], m + t - 1, 2 * c)

    # column j = 2r' + plane holds branch r = C-1-r' (the planar form's
    # flip); its tap vector is p[C-1-r', :], repeated for both planes
    pcol = jnp.repeat(params.p[::-1, :], 2, axis=0)    # [2C, T]
    w = jnp.zeros((*seg.shape[:-2], m, 2 * c), seg.dtype)
    for q in range(t):                                 # T fused MACs
        w = w + pcol[:, q] * seg[..., t - 1 - q: t - 1 - q + m, :]

    # complex DFT across the interleaved branch-pair axis:
    #   y[c] = sum_{r'} E[c, C-1-r'] * (w[2r'] + j w[2r'+1])
    e2_r = params.e_r[:, ::-1]                         # E[c, C-1-r']
    e2_i = params.e_i[:, ::-1]
    g_i = jnp.stack([e2_r, -e2_i], axis=-1).reshape(c, 2 * c)
    g_q = jnp.stack([e2_i, e2_r], axis=-1).reshape(c, 2 * c)
    dot = lambda g: jnp.einsum(  # noqa: E731
        "cj,...mj->...cm", g, w, precision=precision)
    y_i, y_q = dot(g_i), dot(g_q)

    new_tail = ext[..., -2 * (k - 1):]
    new_tail = new_tail.reshape(*new_tail.shape[:-1], k - 1, 2)
    return (y_i, y_q), ChannelizerState(tail_i=new_tail[..., 0],
                                        tail_q=new_tail[..., 1])


def rssi_dbfs(y_i: Array, y_q: Array) -> Array:
    """Per-channel received signal strength, dB full-scale.

    ``y_i``/``y_q``: [..., C, M] channelizer output for one block.
    Returns [..., C].  An FM carrier reads near 20*log10(amplitude);
    an empty channel reads the (quantization-)noise floor — threshold
    ~15-20 dB above the minimum to squelch static (an FM demod on an
    empty channel outputs full-scale noise, like any radio between
    stations).
    """
    p = jnp.mean(y_i * y_i + y_q * y_q, axis=-1)
    return 10.0 * jnp.log10(jnp.maximum(p, 1e-12))
