"""Stateful block FIR filtering, decimation and rational resampling.

These are the TPU-native equivalents of the reference's hand-written MAC
loops (``blockConvolveFIR`` src/filter.cpp:66-83, ``downsampleBlockConvolveFIR``
src/filter.cpp:123-140, ``resampleBlockConvolveFIR`` src/filter.cpp:142-173,
``convolveFIR`` src/filter.cpp:53-64).  Instead of translating the loops, the
overlap-save recurrence is expressed as a single ``lax.conv_general_dilated``:

    y = conv(concat(state, x) dilated by U, flip(h), stride=D)

which XLA tiles onto the MXU/VPU and fuses with neighbouring elementwise
work.  The carried ``state`` is the last ``S`` *input* samples, exactly the
reference's overlap-save tail:

  * plain / decimating FIR: ``S = num_taps - 1`` (project.cpp:242-250)
  * polyphase resampler:   ``S = (num_taps - 1) // U`` — the polyphase access
    pattern only ever reaches ``floor((K-1)/U)`` input samples into the past
    (filter.cpp:158-166; matches the Python model's ``len(h)/U - 1``,
    fmMonoBlock.py:338)

All ops accept arbitrary leading batch dimensions on ``x``/``state`` and are
jit/vmap/shard_map friendly (static shapes, no data-dependent control flow).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def state_len(num_taps: int, up: int = 1) -> int:
    """Carried-state length for a (resampling) block FIR."""
    return (num_taps - 1) // up


def init_state(num_taps: int, up: int = 1, batch: tuple[int, ...] = (),
               dtype=jnp.float32) -> Array:
    return jnp.zeros((*batch, state_len(num_taps, up)), dtype)


def _tile_len(up: int, down: int, m: int, target: int = 256) -> int:
    """Output-tile length for the Toeplitz-matmul path.

    Must make the per-tile input stride ``T*down/up`` an integer, i.e. be a
    multiple of ``up/gcd(up, down)``; aim near ``target`` outputs for MXU
    shape, never beyond the block's output count ``m``.
    """
    period = up // math.gcd(up, down)
    if m <= period:
        return m if (m * down) % up == 0 else period
    t = period * max(1, round(target / period))
    return min(t, period * (m // period)) if m >= period else t


@functools.cache
def _toeplitz_plan(k: int, up: int, down: int, pad_lo: int, tile: int):
    """Precompute (gather index, mask, input window W) for the banded
    matrix H[w, t] = h[(k-1) - (w*up + pad_lo - t*down)] (see
    ``_fir_matmul``); cached on static geometry only."""
    w_len = (k - 1 - pad_lo + (tile - 1) * down) // up + 1
    w = np.arange(w_len)[:, None]
    t = np.arange(tile)[None, :]
    expr = w * up + pad_lo - t * down
    mask = (expr >= 0) & (expr <= k - 1)
    idx = np.where(mask, (k - 1) - expr, 0).astype(np.int32)
    return idx, mask.astype(np.float32), w_len


def _fir_matmul(x_ext: Array, h: Array, *, up: int, down: int,
                pad_lo: int, m: int, precision) -> Array:
    """MXU path: the stateful (resampling) FIR as a tiled banded matmul.

    Derivation: the dilated-conv output is
        y[m] = sum_w x_ext[w] * h[(K-1) - (w*up + pad_lo - m*down)]
    Tiling m = j*T + t with integer input stride ``s = T*down/up`` makes the
    coefficient independent of j, so
        y[j*T + t] = P[j, :] @ H[:, t],  P[j, w'] = x_ext[j*s + w']
    — one [n_tiles, W] x [W, T] matmul per (batched) stream instead of a
    1-feature conv the TPU cannot tile onto the MXU.  ~(W*T)/(K*T/up) FLOP
    inflation, paid at MXU rate; the masked-gather H build is O(W*T).

    ``h`` may be [K] (single filter -> y [..., M]) or [F, K] (filter bank
    sharing one input -> y [..., F, M]).
    """
    bank = h.ndim == 2
    k = h.shape[-1]
    tile = _tile_len(up, down, m)
    idx, mask, w_len = _toeplitz_plan(k, up, down, pad_lo, tile)
    hmat = h[..., idx] * jnp.asarray(mask)          # [(F,) W, T]

    n_tiles = -(-m // tile)                          # ceil
    stride = tile * down // up
    need = (n_tiles - 1) * stride + w_len
    x_pad = x_ext
    if need > x_ext.shape[-1]:
        pad = [(0, 0)] * (x_ext.ndim - 1) + [(0, need - x_ext.shape[-1])]
        x_pad = jnp.pad(x_ext, pad)
    # patches via shifted reshapes: P[..., j, w'] = x_pad[..., j*stride+w']
    n_shift = -(-w_len // stride)
    cols = []
    for i in range(n_shift):
        seg = x_pad[..., i * stride: i * stride + n_tiles * stride]
        seg = jnp.pad(seg, [(0, 0)] * (x_ext.ndim - 1)
                      + [(0, n_tiles * stride - seg.shape[-1])])
        cols.append(seg.reshape((*seg.shape[:-1], n_tiles, stride)))
    patches = jnp.concatenate(cols, axis=-1)[..., :w_len]  # [..., nt, W]

    if bank:
        # grouped: per-filter input streams [..., F, L] with filters [F, K]
        y = jnp.einsum("...fnw,fwt->...fnt", patches, hmat,
                       precision=precision)
    else:
        y = jnp.einsum("...nw,wt->...nt", patches, hmat, precision=precision)
    return y.reshape((*y.shape[:-2], n_tiles * tile))[..., :m]


def _conv1d(x: Array, h: Array, *, up: int, down: int,
            pad_lo: int, pad_hi: int, precision) -> Array:
    """Batched 1-D convolution core. x: [..., N], h: [K] -> [..., M]."""
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    lhs = x.reshape((-1, 1, n))                      # [B, C=1, N]
    rhs = jnp.flip(h, -1).reshape((1, 1, h.shape[0]))  # [O=1, I=1, K]
    out = lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(down,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=precision,
    )
    return out.reshape((*batch_shape, out.shape[-1]))


def convolve_full(x: Array, h: Array,
                  precision=lax.Precision.HIGHEST) -> Array:
    """Single-pass linear convolution, output length N+K-1.

    Equivalent of the reference validation path ``convolveFIR``
    (src/filter.cpp:53-64).
    """
    k = h.shape[0]
    return _conv1d(x, h, up=1, down=1, pad_lo=k - 1, pad_hi=k - 1,
                   precision=precision)


def block_fir_resample(x: Array, h: Array, state: Array, *,
                       up: int = 1, down: int = 1,
                       precision=lax.Precision.HIGHEST,
                       impl: str = "auto") -> tuple[Array, Array]:
    """Stateful polyphase FIR: upsample by ``up``, filter, keep every
    ``down``-th output.  Returns ``(y, new_state)``.

    ``x``: [..., N] with N*up divisible by down; ``state``: [..., S] where
    ``S = (len(h)-1)//up``.  Semantics match src/filter.cpp:142-173 with the
    state tail indexed in input-sample units.
    """
    k = h.shape[0]
    n = x.shape[-1]
    s = state.shape[-1]
    expected_s = state_len(k, up)
    if s != expected_s:
        raise ValueError(f"state length {s} != {expected_s} for K={k}, U={up}")
    if (n * up) % down != 0:
        raise ValueError(f"block length {n}*{up} not divisible by {down}")
    if n < expected_s:
        raise ValueError(f"block length {n} shorter than carried state "
                         f"{expected_s}; use a larger block")
    m = n * up // down

    x_ext = jnp.concatenate([state, x], axis=-1)     # [..., S+N]
    # Output m reads dilated window [S*up + m*down - (K-1), S*up + m*down].
    pad_lo = (k - 1) - s * up                        # in [0, up-1]
    if impl == "auto":
        impl = "matmul" if jax.default_backend() == "tpu" else "conv"
    if impl == "matmul":
        y = _fir_matmul(x_ext, h, up=up, down=down, pad_lo=pad_lo, m=m,
                        precision=precision)
    else:
        dilated_len = (s + n - 1) * up + 1
        pad_hi = max(0, (m - 1) * down + k - pad_lo - dilated_len)
        y = _conv1d(x_ext, h, up=up, down=down, pad_lo=pad_lo,
                    pad_hi=pad_hi, precision=precision)
        y = y[..., :m]
    new_state = x[..., n - expected_s:] if expected_s else state
    return y, new_state


def block_fir(x: Array, h: Array, state: Array, *,
              precision=lax.Precision.HIGHEST,
              impl: str = "auto") -> tuple[Array, Array]:
    """Same-length stateful FIR (overlap-save), src/filter.cpp:66-83."""
    return block_fir_resample(x, h, state, up=1, down=1, precision=precision,
                              impl=impl)


def block_fir_decim(x: Array, h: Array, state: Array, decim: int, *,
                    precision=lax.Precision.HIGHEST,
                    impl: str = "auto") -> tuple[Array, Array]:
    """Decimating stateful FIR computing only kept outputs,
    src/filter.cpp:123-140.

    ``impl="pallas"`` selects the double-buffered Pallas kernel
    (true-K MACs on the VPU, no Toeplitz FLOP inflation).  Measured: it
    beats the matmul path ~18% at small batch (B=128 rows) but loses 2x
    at the serving batch (1024 rows), where bf16 MXU throughput wins —
    so ``auto`` never picks it; it remains the small-batch/latency
    option.
    """
    if impl == "pallas":
        from dy4tpu.ops import fir_pallas
        return fir_pallas.block_fir_decim_pallas(x, h, state, decim)
    return block_fir_resample(x, h, state, up=1, down=decim,
                              precision=precision, impl=impl)


def block_fir_bank(x: Array, hs: Array, states: Array, *,
                   precision=lax.Precision.HIGHEST,
                   impl: str = "auto") -> tuple[Array, Array]:
    """Apply a bank of F same-length FIR filters to one input in a single
    fused convolution (one HBM read of ``x`` for all filters).

    Used to fuse the pilot/stereo/RDS-band/RDS-carrier band-pass filters
    that all read ``fm_demod`` (project.cpp:120-121, fmMonoBlock.py:652-653,
    673).  ``hs``: [F, K]; ``states``: either [..., K-1] (ONE shared
    history — the filters all read the same stream, so its last K-1
    samples serve every row; this is what ``ReceiverState`` carries) or
    [..., F, K-1] (independent per-filter histories, full generality).
    Returns ``y: [..., F, N]`` and new states in the same form.
    """
    f, k = hs.shape
    n = x.shape[-1]
    batch_shape = x.shape[:-1]
    s = k - 1
    shared = states.ndim == x.ndim           # [..., K-1]: one history
    if shared:
        states = jnp.broadcast_to(states[..., None, :],
                                  (*batch_shape, f, s))
    x_b = jnp.broadcast_to(x[..., None, :], (*batch_shape, f, n))
    x_ext = jnp.concatenate([states, x_b], axis=-1)    # [..., F, S+N]
    if impl == "auto":
        impl = "matmul" if jax.default_backend() == "tpu" else "conv"
    if impl == "matmul":
        y = _fir_matmul(x_ext, hs, up=1, down=1, pad_lo=0, m=n,
                        precision=precision)
        return y, (x[..., n - s:] if shared else x_b[..., n - s:])
    rhs = jnp.flip(hs, -1).reshape((f, 1, k))          # [F, 1, K]
    # Group the F filters as feature groups: batch stays B, features F.
    lhs = x_ext.reshape((-1, f, s + n))                # [B, F, S+N]
    out = lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(1,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=f,
        precision=precision,
    )                                                   # [B, F, N]
    y = out.reshape((*batch_shape, f, n))
    new_states = x[..., n - s:] if shared else x_b[..., n - s:]
    return y, new_states


@functools.partial(jax.jit, static_argnames=("factor",))
def downsample(x: Array, factor: int) -> Array:
    """Take every ``factor``-th sample (src/filter.cpp:104-110)."""
    return x[..., ::factor]


@functools.partial(jax.jit, static_argnames=("factor",))
def upsample(x: Array, factor: int) -> Array:
    """Zero-stuff: each sample followed by ``factor-1`` zeros
    (src/filter.cpp:112-121)."""
    shape = (*x.shape[:-1], x.shape[-1], factor)
    out = jnp.zeros(shape, x.dtype).at[..., 0].set(x)
    return out.reshape((*x.shape[:-1], x.shape[-1] * factor))
