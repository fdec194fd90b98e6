"""Fused RF front end: u8 IQ block -> FM demod output in one VMEM pass.

Replaces four HBM round trips of the RF-rate stream (u8 read, normalized
f32 I/Q write+read, Toeplitz-patch write+read, decimated I/Q write+read
— the lowering of ``(iq_u8-128)/128`` + ``fir.block_fir_decim`` +
``demod.fm_demod_diff``, the hot path of src/filter.cpp:123-140 +
project.cpp:86-90) with ONE kernel that reads the u8 block, normalizes,
deinterleaves, runs both decimating FIR legs as an on-MXU banded matmul
built from VMEM patches, and demodulates — writing only the IF-rate
``fm`` stream (D*8x fewer output bytes than input bytes).

Two kernel formulations (see /opt/skills/guides/pallas_guide.md):

* ``fused_frontend_raw`` (serving default, 1.9x the phase variant) —
  consumes the interleaved u8 block DIRECTLY.  Both the I/Q
  deinterleave and the decimation phases live in the banded matrix's
  tap pattern: window position w carries tap j' of leg L iff
  w = 2*(t*D - j') + w0 + L, i.e. sample parity selects the leg and the
  stride -2 band selects the phase.  No u8 phase pre-split (measured
  ~1.5 ms/block of pure XLA relayout at C=512) and no in-kernel
  per-phase window assembly (the lane->sublane shuffles that bounded
  the phase kernel): per output tile the window is ONE contiguous
  [W = 2*T*D + w0]-sample slab of the raw stream, assembled with one
  aligned bulk store + J small history copies.  The (x-128)/128
  normalize folds into the matrix (/128) and a single scalar epilogue
  subtract (the +128 offset times sum(h) — the discriminator is
  scale-invariant but not offset-invariant).
* ``fused_frontend`` ("fused-phase", kept for A/B) — pre-splits the u8
  stream OUTSIDE the kernel (u8-rate XLA transpose) into the 2*D
  interleave/decimation phases ``x20 [C, 2*D, N/D]``; each phase's
  window is a pair of aligned reshapes of that phase row, grouped into
  ``Pg [BC, J, D*2T]`` patches.
* Either way: one ``jnp.dot`` per leg on the MXU (M-dim BC*J, K ~1-3k,
  N = 128 output tile), then the demodulator as a handful of VPU ops on
  the [BC, M] result.

Numerics: accumulation order differs from the conv/matmul XLA paths, so
outputs agree to fp32 tolerance (pinned in tests/test_frontend_pallas.py),
not bitwise; the precision flag mirrors the receiver's (bf16-input
matmul for DEFAULT serving, f32 for HIGHEST).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_T = 128       # output tile (lanes)
_BC = 8        # channel rows per grid cell (M-dim of the dot = BC*J;
#                BC=16 exceeds the 16 MB VMEM scoped limit)


@functools.cache
def _hg_plan(k: int, decim: int):
    """Phase-grouped banded matrix Hg [D*2T, T].

    The kernel's per-phase window is a full 2T-lane tile pair (all
    concats/reshapes stay 128-aligned — Mosaic rejects sub-lane-tile
    concatenation), whose column c maps to phase-stream sample
    ``q = c - (T - s_ph)``; columns outside the tap-validity window
    (including the q<0 spill into earlier samples / zero padding) are
    masked to zero: Hg[(r*2T + c), t] = h[j'] for
    j' = t*D + (K-1) - (D*q + r) when 0 <= j' < K, else 0.

    Returns (tap index matrix, mask) — applied to ``h`` at trace time so
    the filter stays a runtime parameter.
    """
    s_ph = (k - 1) // decim
    r = np.arange(decim)[:, None, None]               # phase
    q = (np.arange(2 * _T) - (_T - s_ph))[None, :, None]
    t = np.arange(_T)[None, None, :]
    jp = t * decim + (k - 1) - (q * decim + r)
    mask = (jp >= 0) & (jp <= k - 1)
    idx = np.where(mask, jp, 0).reshape(decim * 2 * _T, _T).astype(np.int32)
    return idx, mask.reshape(decim * 2 * _T, _T).astype(np.float32)


def _kernel(x20_ref, tailph_ref, prev_ref, hg_ref, fm_ref, last_ref,
            row_s, pg_s, xf_s, *, decim: int, n_out: int, mm_dtype):
    """One channel tile: u8 phases -> fm.

    Window scratch lives in ``mm_dtype``: for bf16 serving this halves
    the relayout traffic at zero quality cost — the u8-derived samples
    (x-128)/128 are integers/128, exactly representable in bf16's 8-bit
    mantissa, and the dot consumes bf16 anyway.

    Shapes (phase dims LEADING so
    every per-phase access is a slab select, never an offset-layout
    slice — Mosaic miscompiles/rejects those):
    x20 [2D, BC, M], tailph [2, D, BC, T] (tail right-aligned in the
    lane tile), prev [BC, T] (prev_i/prev_q in lanes 0/1),
    hg [D*2T, T], fm [BC, M], last [BC, T].
    Scratch: row_s [BC, T+M], pg_s [BC, J, D*2T], xf_s [2D, BC, M] (all
    mm_dtype) — windows are assembled with 128-aligned ref stores."""
    bc = fm_ref.shape[0]
    j_tiles = n_out // _T
    lane = jax.lax.broadcasted_iota(jnp.int32, (bc, n_out), 1)

    # normalize the WHOLE u8 block into mm_dtype scratch in one
    # vectorized pass: per-phase u8 row loads would read 8-sublane slabs
    # out of (32,128)-tiled int8 memory, which Mosaic lowers poorly
    # (u8 -> i32 -> f32: no direct u8->f32 cast)
    xf = x20_ref[:].astype(jnp.int32).astype(jnp.float32)
    xf_s[:] = ((xf - 128.0) * jnp.float32(1.0 / 128.0)).astype(mm_dtype)

    legs = []
    for leg in range(2):
        for r in range(decim):
            row_s[:, :_T] = tailph_ref[leg, r].astype(mm_dtype)
            row_s[:, _T:] = xf_s[2 * r + leg]
            row = row_s[:]
            a = row[:, :j_tiles * _T].reshape(bc, j_tiles, _T)
            b = row[:, _T:].reshape(bc, j_tiles, _T)
            c0 = r * 2 * _T
            pg_s[:, :, c0:c0 + _T] = a
            pg_s[:, :, c0 + _T:c0 + 2 * _T] = b
        pg = pg_s[:].reshape(bc * j_tiles, decim * 2 * _T)
        # f32 mm_dtype requests a HIGHEST-precision pass (bf16x multi-pass
        # on the MXU); bf16 is the production-serving config
        prec = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        y = jnp.dot(pg, hg_ref[:].astype(mm_dtype),
                    preferred_element_type=jnp.float32, precision=prec)
        legs.append(y.reshape(bc, n_out))

    i_ds, q_ds = legs
    # one-sample delay via roll + first-lane substitution (no sub-tile
    # concats)
    i_prev = jnp.where(lane == 0, prev_ref[:, 0:1],
                       pltpu.roll(i_ds, 1, 1))
    q_prev = jnp.where(lane == 0, prev_ref[:, 1:2],
                       pltpu.roll(q_ds, 1, 1))
    power = i_ds * i_ds + q_ds * q_ds
    num = i_ds * (q_ds - q_prev) - q_ds * (i_ds - i_prev)
    fm_ref[:] = jnp.where(power == 0, 0.0,
                          num / jnp.where(power == 0, 1.0, power))
    # carried prev = last decimated I/Q, emitted in lanes 0/1
    last_i = jnp.sum(jnp.where(lane == n_out - 1, i_ds, 0.0), axis=1,
                     keepdims=True)
    last_q = jnp.sum(jnp.where(lane == n_out - 1, q_ds, 0.0), axis=1,
                     keepdims=True)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (bc, _T), 1)
    last_ref[:] = jnp.where(lane_t == 0, last_i,
                            jnp.where(lane_t == 1, last_q, 0.0))


def _demod_emit(i_ds, q_ds, prev_ref, last_ref, n_out: int):
    """Shared FM-discriminator epilogue: one-sample delay via roll +
    first-lane substitution from ``prev`` (lanes 0/1), /power guard, and
    the carried last-decimated-I/Q tile emitted into ``last_ref``.
    Returns the fm block."""
    bc = i_ds.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bc, n_out), 1)
    i_prev = jnp.where(lane == 0, prev_ref[:, 0:1], pltpu.roll(i_ds, 1, 1))
    q_prev = jnp.where(lane == 0, prev_ref[:, 1:2], pltpu.roll(q_ds, 1, 1))
    power = i_ds * i_ds + q_ds * q_ds
    num = i_ds * (q_ds - q_prev) - q_ds * (i_ds - i_prev)
    fm = jnp.where(power == 0, 0.0,
                   num / jnp.where(power == 0, 1.0, power))
    last_i = jnp.sum(jnp.where(lane == n_out - 1, i_ds, 0.0), axis=1,
                     keepdims=True)
    last_q = jnp.sum(jnp.where(lane == n_out - 1, q_ds, 0.0), axis=1,
                     keepdims=True)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (bc, _T), 1)
    last_ref[:] = jnp.where(lane_t == 0, last_i,
                            jnp.where(lane_t == 1, last_q, 0.0))
    return fm


def _raw_tail_prev(iq_tail, prev_i, prev_q, k: int, w0: int):
    """Wrapper-side prep shared by the raw-stream kernels: normalized
    [C, 2, K-1] tail -> raw-scale interleaved [C, w0] (right-aligned),
    and prev I/Q packed into lanes 0/1 of a [C, T] tile."""
    c = iq_tail.shape[0]
    tail_raw = jnp.swapaxes(iq_tail, -1, -2).reshape(c, 2 * (k - 1))
    tail_raw = tail_raw * 128.0 + 128.0
    tail_raw = jnp.pad(tail_raw, ((0, 0), (w0 - 2 * (k - 1), 0)))
    prev = jnp.stack([prev_i, prev_q], axis=-1)
    prev = jnp.pad(prev, ((0, 0), (0, _T - 2)))
    return tail_raw, prev


def _new_iq_tail(iq_u8, k: int):
    """Next block's normalized [C, 2, K-1] RF tail from the raw block."""
    c, bs = iq_u8.shape
    tail_iq = iq_u8[:, bs - 2 * (k - 1):].astype(jnp.float32)
    tail_iq = (tail_iq - 128.0) / 128.0
    return jnp.swapaxes(tail_iq.reshape(c, k - 1, 2), -1, -2)


@functools.cache
def _hraw_plan(k: int, decim: int, w0: int):
    """Raw-stream banded matrices Hraw [2, W, T] (legs I/Q), W = 2*T*D + w0.

    The kernel's per-tile window is W raw interleaved samples starting at
    ext index 2*T*D*j (ext = [w0-lane history slab || raw block]), so the
    deinterleave AND the decimation phases live entirely in the tap
    pattern: window position w carries tap j' of leg L iff
    w = 2*(t*D - j') + w0 + L, i.e. parity selects the leg and the stride
    -2 band selects the phase — no per-phase relayout at all.
    """
    w = np.arange(2 * _T * decim + w0)[None, :, None]
    t = np.arange(_T)[None, None, :]
    leg = np.arange(2)[:, None, None]
    num = w0 + leg - w
    jp = t * decim + num // 2
    mask = (num % 2 == 0) & (jp >= 0) & (jp <= k - 1)
    idx = np.where(mask, jp, 0).astype(np.int32)
    return idx, mask.astype(np.float32)


def _kernel_raw(sumh_ref, x_ref, tail_ref, prev_ref, hr_ref, fm_ref,
                last_ref, ext_s, pg_s, *, decim: int, n_out: int, w0: int,
                mm_dtype, split: int = 1):
    """Raw-stream channel tile: x [BC, bs] u8, tail [BC, w0] (raw scale,
    right-aligned), hr [W, 2T] (both legs' columns side by side),
    prev [BC, T] -> fm [BC, M], last.
    Scratch: ext_s [BC, w0+bs] mm (history ++ raw block), pg_s
    [split, BC, J/split, W] mm (per-tile windows: one aligned bulk store
    for the stride part + J tiny W0-slab copies for the overhang).

    Both I/Q legs ride ONE [BC*J, W] x [W, 2T] dot: at this M (~480)
    the MXU is pipeline-drain-bound, and one N=256 dot measured 13%
    faster than two N=128 dots at the exact shape (round-3 probe).
    ``split`` > 1 interleaves window-build and dot per J-half so the
    VPU build of half s+1 can overlap the MXU dot of half s (round-4
    experiment; the split axis leads the scratch so each half is a
    contiguous slab)."""
    bc = fm_ref.shape[0]
    stride = 2 * _T * decim
    wlen = stride + w0
    j_tiles = n_out // _T
    bs = j_tiles * stride
    lane = jax.lax.broadcasted_iota(jnp.int32, (bc, n_out), 1)

    # one vectorized u8 -> mm_dtype pass; raw integer values are exact in
    # bf16 (8-bit mantissa covers 0..255) so the (x-128)/128 normalize
    # folds into the dot epilogue: y/128 - sum(h)
    ext_s[:, :w0] = tail_ref[:].astype(mm_dtype)
    ext_s[:, w0:] = (x_ref[:].astype(jnp.int32).astype(jnp.float32)
                     .astype(mm_dtype))

    prec = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # remove the +128 offset BEFORE the demod: the discriminator is
    # scale-invariant but not offset-invariant.  raw-dot y = true + sum_h.
    sum_h = sumh_ref[0, 0]
    jh = j_tiles // split
    ys = []
    for s in range(split):
        j0 = s * jh
        pg_s[s, :, :, :stride] = (
            ext_s[:, j0 * stride:(j0 + jh) * stride]
            .reshape(bc, jh, stride))
        for j in range(jh):
            pg_s[s, :, j, stride:] = ext_s[:, stride * (j0 + j + 1):
                                           stride * (j0 + j + 1) + w0]
        pg = pg_s[s].reshape(bc * jh, wlen)
        ys.append(jnp.dot(pg, hr_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=prec).reshape(bc, jh, 2 * _T))
    y = ys[0] if split == 1 else jnp.concatenate(ys, axis=1)
    i_ds = y[:, :, :_T].reshape(bc, n_out) - sum_h
    q_ds = y[:, :, _T:].reshape(bc, n_out) - sum_h
    fm_ref[:] = _demod_emit(i_ds, q_ds, prev_ref, last_ref, n_out)


def _kernel_raw_pm(sumh_ref, x_ref, tail_ref, prev_ref, hr_ref, fm_ref,
                   last_ref, ext_s, pg_s, *, decim: int, n_out: int,
                   w0: int, mm_dtype):
    """Plane-major raw kernel: x [BC, bs/4] i32 (4 packed u8 samples per
    word — bitcast outside),
    hr [2, W, T] with rows plane-major-permuted, prev [BC, T];
    tail [4, BC, w0/4] plane-leading.

    The u8->f32 widening of the v1 kernel crosses int8 (32,128) ->
    f32 (8,128) tilings — a sublane-expansion relayout Mosaic lowers
    poorly.  Here each of the 4 byte planes is extracted from the i32
    words with shift/AND (native (8,128) ops, zero relayout) and
    converted with the magic-number trick (OR exponent 2^23, bitcast,
    subtract): integers 0..255 exactly.  The byte-plane permutation of
    the window columns is absorbed into the banded matrix's row order —
    a free trace-time reorder of Hraw.
    """
    bc = fm_ref.shape[0]
    stride = 2 * _T * decim
    wlen = stride + w0
    s4, w04, wl4 = stride // 4, w0 // 4, wlen // 4
    j_tiles = n_out // _T
    bs4 = j_tiles * s4
    lane = jax.lax.broadcasted_iota(jnp.int32, (bc, n_out), 1)

    # per-plane extraction, chunked along length so the i32/f32
    # temporaries stay small (Mosaic stacks full-width temps otherwise)
    tpc = max(d for d in range(1, 9) if j_tiles % d == 0)
    n_chunks = j_tiles // tpc
    cl = s4 * tpc
    # plane axis LEADING everywhere (ext_s [4, BC, n4], tail [4, BC,
    # w04]) so each per-plane access is a contiguous slab select —
    # middle-dim indexing made Mosaic materialise whole-buffer copies
    # (~20 MB of scoped-vmem temporaries)
    for b in range(4):
        ext_s[b, :, :w04] = tail_ref[b].astype(mm_dtype)
        for s in range(n_chunks):
            x32 = x_ref[:, s * cl:(s + 1) * cl]
            v = jax.lax.shift_right_logical(x32, 8 * b) & 0xFF
            f = jax.lax.bitcast_convert_type(v | 0x4B000000, jnp.float32)
            ext_s[b, :, w04 + s * cl:w04 + (s + 1) * cl] = (
                f - jnp.float32(8388608.0)).astype(mm_dtype)
        # plane b occupies lane range [b*wl4, (b+1)*wl4) of the window —
        # contiguous 128-aligned lane slices, never a strided scatter
        pg_s[:, :, b * wl4:b * wl4 + s4] = (
            ext_s[b, :, :bs4].reshape(bc, j_tiles, s4))
        for j in range(j_tiles):
            pg_s[:, j, b * wl4 + s4:(b + 1) * wl4] = (
                ext_s[b, :, s4 * (j + 1):s4 * (j + 1) + w04])

    pg = pg_s[:].reshape(bc * j_tiles, wlen)
    prec = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sum_h = sumh_ref[0, 0]
    legs = []
    for leg in range(2):
        y = jnp.dot(pg, hr_ref[leg],
                    preferred_element_type=jnp.float32, precision=prec)
        legs.append(y.reshape(bc, n_out) - sum_h)

    i_ds, q_ds = legs
    fm_ref[:] = _demod_emit(i_ds, q_ds, prev_ref, last_ref, n_out)


def fused_frontend_raw_pm(iq_u8: Array, h: Array, iq_tail: Array,
                          prev_i: Array, prev_q: Array, decim: int, *,
                          mm_dtype=jnp.bfloat16,
                          interpret: bool = False
                          ) -> tuple[Array, Array, Array, Array]:
    """Plane-major raw-stream front end (see ``_kernel_raw_pm``): same
    contract as ``fused_frontend_raw``, with the u8 block packed into
    i32 words outside the kernel so the in-kernel conversion never
    crosses the int8 memory tiling.

    EXPERIMENTAL — measured 3.2x slower than ``fused_frontend_raw``
    (176.9 vs 55.7 ms at C=512 B=48 on v5e): the u8 widening it avoids
    is not the serving kernel's bound (the banded dot is), and the
    per-plane slab assembly costs more than it saves.  Kept with tests
    as the record of that measurement; do not wire into front_step."""
    c, bs = iq_u8.shape
    k = h.shape[0]
    n_out = bs // 2 // decim
    assert n_out % _T == 0, (n_out, _T)
    # history slab: multiple of 4*T so the per-plane slab w0/4 stays
    # lane-aligned (128)
    w0 = -(-2 * (k - 1) // (4 * _T)) * (4 * _T)
    stride = 2 * _T * decim
    assert w0 <= stride, (w0, stride)
    idx, mask = _hraw_plan(k, decim, w0)
    hb = (h * jnp.float32(1.0 / 128.0)).astype(mm_dtype)
    sum_h = 128.0 * jnp.sum(hb.astype(jnp.float32))
    hr = h[idx] * jnp.asarray(mask) * jnp.float32(1.0 / 128.0)
    wlen = stride + w0
    # plane-major row permutation: new row b*(W/4)+w4 <- old row 4*w4+b;
    # pre-cast to mm_dtype so the kernel never materialises a cast temp
    hr = (hr.reshape(2, wlen // 4, 4, _T)
          .transpose(0, 2, 1, 3).reshape(2, wlen, _T).astype(mm_dtype))

    # bc_rows stays 8 for f32 too: Mosaic requires channel-block rows
    # divisible by 8 (a 4-row tile fails to lower), so the f32 variant
    # keeps the tile and raises the scoped-VMEM limit instead (the 16 MB
    # scope is a compiler default, not the hardware — round-4 probe ran
    # 128 MB)
    bc_rows = _BC

    tail_raw, prev = _raw_tail_prev(iq_tail, prev_i, prev_q, k, w0)
    tail_pm = jnp.transpose(tail_raw.reshape(c, w0 // 4, 4), (2, 0, 1))

    x32 = jax.lax.bitcast_convert_type(
        iq_u8.reshape(c, bs // 4, 4), jnp.int32)

    c_pad = -(-c // bc_rows) * bc_rows
    if c_pad != c:
        pc = c_pad - c
        x32 = jnp.pad(x32, ((0, pc), (0, 0)))
        tail_pm = jnp.pad(tail_pm, ((0, 0), (0, pc), (0, 0)))
        prev = jnp.pad(prev, ((0, pc), (0, 0)))

    kern = functools.partial(_kernel_raw_pm, decim=decim, n_out=n_out,
                             w0=w0, mm_dtype=mm_dtype)
    fm, last = pl.pallas_call(
        kern,
        grid=(c_pad // bc_rows,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bc_rows, bs // 4), lambda i: (i, 0)),
            pl.BlockSpec((4, bc_rows, w0 // 4), lambda i: (0, i, 0)),
            pl.BlockSpec((bc_rows, _T), lambda i: (i, 0)),
            pl.BlockSpec((2, wlen, _T), lambda i: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bc_rows, n_out), lambda i: (i, 0)),
            pl.BlockSpec((bc_rows, _T), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_pad, n_out), jnp.float32),
            jax.ShapeDtypeStruct((c_pad, _T), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, bc_rows, (w0 + bs) // 4), mm_dtype),
            pltpu.VMEM((bc_rows, n_out // _T, wlen), mm_dtype),
        ],
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20)
            if mm_dtype == jnp.float32 else None),
        interpret=interpret,
    )(sum_h.reshape(1, 1), x32, tail_pm, prev, hr)
    fm_t, last_t = fm[:c], last[:c]
    new_tail = _new_iq_tail(iq_u8, k)
    return fm_t, new_tail, last_t[:, 0], last_t[:, 1]


def fused_frontend_raw(iq_u8: Array, h: Array, iq_tail: Array,
                       prev_i: Array, prev_q: Array, decim: int, *,
                       mm_dtype=jnp.bfloat16,
                       bc_rows: int | None = None,
                       vmem_limit_bytes: int | None = None,
                       split: int = 1,
                       interpret: bool = False
                       ) -> tuple[Array, Array, Array, Array]:
    """Raw-stream variant of ``fused_frontend``: identical contract, but
    the kernel consumes the interleaved u8 block directly — no phase
    pre-split transpose at u8 rate (measured ~1.5 ms/block of pure XLA
    relayout at C=512), and the normalize is folded into the dot
    epilogue: raw u8 integers are bf16-exact, the /128 folds into Hraw,
    and the remaining constant offset (raw-dot y = true + sum_h) is
    subtracted in-kernel before the demod (the discriminator is
    scale-invariant but not offset-invariant)."""
    c, bs = iq_u8.shape
    k = h.shape[0]
    n_iq = bs // 2
    n_out = n_iq // decim
    assert n_out % _T == 0, (n_out, _T)
    # channel rows per grid cell: always the full 8-row tile — Mosaic
    # requires channel-block rows divisible by 8 (a 4-row tile fails to
    # lower), so the f32 (HIGHEST) variant, whose scratch doubles, keeps
    # the tile and raises the scoped-VMEM limit below instead
    if bc_rows is None:
        bc_rows = _BC
    if vmem_limit_bytes is None and mm_dtype != jnp.bfloat16:
        vmem_limit_bytes = 64 << 20
    w0 = -(-2 * (k - 1) // _T) * _T      # history slab, lane-aligned
    stride = 2 * _T * decim
    assert w0 <= stride, (w0, stride)
    idx, mask = _hraw_plan(k, decim, w0)
    # fold the /128 into Hraw so the epilogue is one subtract; sum_h must
    # match the offset the dot ACTUALLY accumulates, i.e. the mm_dtype-
    # rounded taps times the exact raw constant 128
    hb = (h * jnp.float32(1.0 / 128.0)).astype(mm_dtype)
    sum_h = 128.0 * jnp.sum(hb.astype(jnp.float32))
    # pre-cast so the kernel never materialises a per-grid-step cast temp;
    # legs side by side as [W, 2T] columns for the single merged dot
    hr = (h[idx] * jnp.asarray(mask)
          * jnp.float32(1.0 / 128.0)).astype(mm_dtype)
    hr = jnp.concatenate([hr[0], hr[1]], axis=-1)

    tail_raw, prev = _raw_tail_prev(iq_tail, prev_i, prev_q, k, w0)

    c_pad = -(-c // bc_rows) * bc_rows
    if c_pad != c:
        pc = c_pad - c
        iq_u8 = jnp.pad(iq_u8, ((0, pc), (0, 0)))
        tail_raw = jnp.pad(tail_raw, ((0, pc), (0, 0)))
        prev = jnp.pad(prev, ((0, pc), (0, 0)))

    kern = functools.partial(_kernel_raw, decim=decim, n_out=n_out,
                             w0=w0, mm_dtype=mm_dtype, split=split)
    assert (n_out // _T) % split == 0, (n_out, _T, split)
    wlen = stride + w0
    fm, last = pl.pallas_call(
        kern,
        grid=(c_pad // bc_rows,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bc_rows, bs), lambda i: (i, 0)),
            pl.BlockSpec((bc_rows, w0), lambda i: (i, 0)),
            pl.BlockSpec((bc_rows, _T), lambda i: (i, 0)),
            pl.BlockSpec((wlen, 2 * _T), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bc_rows, n_out), lambda i: (i, 0)),
            pl.BlockSpec((bc_rows, _T), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_pad, n_out), jnp.float32),
            jax.ShapeDtypeStruct((c_pad, _T), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bc_rows, w0 + bs), mm_dtype),
            pltpu.VMEM((split, bc_rows, n_out // _T // split, wlen),
                       mm_dtype),
        ],
        compiler_params=(None if vmem_limit_bytes is None else
                         pltpu.CompilerParams(
                             vmem_limit_bytes=vmem_limit_bytes)),
        interpret=interpret,
    )(sum_h.reshape(1, 1), iq_u8, tail_raw, prev, hr)
    fm_t, last_t = fm[:c], last[:c]
    new_tail = _new_iq_tail(iq_u8[:c], k)
    return fm_t, new_tail, last_t[:, 0], last_t[:, 1]


@functools.cache
def _hb_plan(k: int):
    """Decim-1 Toeplitz plan [2T, T] for the IF-rate band filters, with a
    T-lane (128) history slab: window position w of tile j holds stream
    sample jT + w - T, so Hb[w, t] = h[t + T - w] where valid."""
    w = np.arange(2 * _T)[:, None]
    t = np.arange(_T)[None, :]
    jp = t + _T - w
    mask = (jp >= 0) & (jp <= k - 1)
    return np.where(mask, jp, 0).astype(np.int32), mask.astype(np.float32)


def _band_stages(fm, hb_ref, hc_ref, bank_hist_ref, fmdel_hist_ref,
                 sq_hist_ref, rds_hist_ref, fmd_ref, pilot_ref,
                 stereo_ref, carrier_ref, rdsdel_ref, fm_last_ref,
                 sq_last_ref, rds_last_ref, bext_s, pgb_s, fmd_s, sqe_s,
                 rdse_s, *, n_out: int, delay: int, rds: bool, mm_dtype):
    """Post-demod LTI stages shared by the RF-entry full kernel and the
    IF-entry one: mono delay, pilot/stereo/RDS band bank, RDS delay,
    squaring + carrier BPF — all on the in-VMEM fm stream (decim-1
    Toeplitz dots over [2T]-windows; delays are static slices of
    128-aligned scratch)."""
    bc = fmd_ref.shape[0]
    j_tiles = n_out // _T
    prec = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def band_windows(ext):
        """[BC, T + n] ext stream -> [BC*J, 2T] tile windows."""
        pgb_s[:, :, :_T] = ext[:, :n_out].reshape(bc, j_tiles, _T)
        for j in range(j_tiles):
            pgb_s[:, j, _T:] = ext[:, _T * j + _T:_T * j + 2 * _T]
        return pgb_s[:].reshape(bc * j_tiles, 2 * _T)

    # ---- mono delay (exact f32 pass-through) ----
    fmd_s[:, :_T] = fmdel_hist_ref[:]
    fmd_s[:, _T:] = fm
    fmd_ref[:] = fmd_s[:, _T - delay:_T - delay + n_out]
    fm_last_ref[:] = fmd_s[:, n_out:]

    # ---- band bank over fm: ONE [BC*J, 2T] x [2T, nb*T] dot for all
    # bands (hb arrives with the band columns side by side — same
    # pipeline-drain argument as the raw kernel's merged leg dot) ----
    bext_s[:, :_T] = bank_hist_ref[:].astype(mm_dtype)
    bext_s[:, _T:] = fm.astype(mm_dtype)
    pgb = band_windows(bext_s[:])
    nb = 3 if rds else 2
    yb = jnp.dot(pgb, hb_ref[:],
                 preferred_element_type=jnp.float32,
                 precision=prec).reshape(bc, j_tiles, nb * _T)
    pilot_ref[:] = yb[:, :, :_T].reshape(bc, n_out)
    stereo_ref[:] = yb[:, :, _T:2 * _T].reshape(bc, n_out)
    if not rds:
        return

    rds_band = yb[:, :, 2 * _T:].reshape(bc, n_out)

    # ---- RDS delay + squaring + carrier BPF ----
    rdse_s[:, :_T] = rds_hist_ref[:]
    rdse_s[:, _T:] = rds_band
    rdsdel_ref[:] = rdse_s[:, _T - delay:_T - delay + n_out]
    rds_last_ref[:] = rdse_s[:, n_out:]

    sq = rds_band * rds_band
    sqe_s[:, :_T] = sq_hist_ref[:].astype(mm_dtype)
    sqe_s[:, _T:] = sq.astype(mm_dtype)
    sq_last_ref[:] = sq[:, n_out - _T:]
    pgc = band_windows(sqe_s[:])
    carrier_ref[:] = jnp.dot(pgc, hc_ref[0],
                             preferred_element_type=jnp.float32,
                             precision=prec).reshape(bc, n_out)


def _kernel_front_full(sumh_ref, x_ref, tail_ref, prev_ref, hr_ref,
                       hb_ref, bank_hist_ref, fmdel_hist_ref, *args,
                       decim: int, n_out: int, w0: int, delay: int,
                       rds: bool, mm_dtype, corr: bool = False):
    """Whole LTI front half in one VMEM pass: raw u8 -> fm (as in
    ``_kernel_raw``) -> mono delay, pilot/stereo/RDS band bank,
    squaring + carrier BPF, RDS delay — the fm/squared streams never
    leave VMEM (they cost D*8x / D*8x the output bytes to round-trip).

    Band/carrier filters are decim-1 Toeplitz dots over [2T]-windows of
    the in-VMEM stream (``_hb_plan``); delays are static 128-aligned-
    scratch slices at offset T - delay.  History slabs arrive
    right-aligned in T lanes, derived from the SAME FrontState fields
    the stock path carries (bank_tail/mono_delay/carrier_tail/
    rds_delay), so the two paths stay state-interchangeable.
    """
    corr_ref = mom_ref = None
    if corr:
        corr_ref, *args = args
    if rds:
        (hc_ref, sq_hist_ref, rds_hist_ref,
         fmd_ref, pilot_ref, stereo_ref, carrier_ref, rdsdel_ref,
         last_ref, fm_last_ref, sq_last_ref, rds_last_ref,
         *rest) = args
    else:
        (fmd_ref, pilot_ref, stereo_ref, last_ref, fm_last_ref,
         *rest) = args
    if corr:
        mom_ref, *rest = rest
    if rds:
        (ext_s, pg_s, bext_s, pgb_s, fmd_s, sqe_s, rdse_s) = rest
    else:
        (ext_s, pg_s, bext_s, pgb_s, fmd_s) = rest

    bc = fmd_ref.shape[0]
    stride = 2 * _T * decim
    wlen = stride + w0
    j_tiles = n_out // _T
    bs = j_tiles * stride
    lane = jax.lax.broadcasted_iota(jnp.int32, (bc, n_out), 1)
    prec = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    # ---- stage 1: raw u8 -> fm (identical math to _kernel_raw) ----
    ext_s[:, :w0] = tail_ref[:].astype(mm_dtype)
    ext_s[:, w0:] = (x_ref[:].astype(jnp.int32).astype(jnp.float32)
                     .astype(mm_dtype))
    pg_s[:, :, :stride] = ext_s[:, :bs].reshape(bc, j_tiles, stride)
    for j in range(j_tiles):
        pg_s[:, j, stride:] = ext_s[:, stride * (j + 1):
                                    stride * (j + 1) + w0]
    pg = pg_s[:].reshape(bc * j_tiles, wlen)
    sum_h = sumh_ref[0, 0]
    # one merged [BC*J, W] x [W, 2T] dot for both legs (see _kernel_raw)
    y = jnp.dot(pg, hr_ref[:],
                preferred_element_type=jnp.float32, precision=prec)
    y = y.reshape(bc, j_tiles, 2 * _T)
    i_ds = y[:, :, :_T].reshape(bc, n_out) - sum_h
    q_ds = y[:, :, _T:].reshape(bc, n_out) - sum_h
    if corr:
        # ---- IQ tracker tap (ops/iqcorr.py), all on the in-VMEM
        # decimated streams — which are ALREADY in the stock path's
        # i_ds units (the u8 (x-128)/128 normalize is folded into the
        # banded matrix and the sum_h epilogue above).  (1) emit the
        # PRE-correction conic-fit moments at IF rate: a raw-rate side
        # pass for these measured -28% of the whole chain, here it is
        # VPU-only on data already resident.  (2) apply the
        # correction: the 2x2 part commutes with the RF LPF, the DC
        # shares the estimation units — no rescale anywhere.
        im, qm = i_ds, q_ds
        i2, q2 = im * im, qm * qm
        i3, q3 = i2 * im, q2 * qm
        mean = lambda v: jnp.mean(v, axis=-1)  # noqa: E731
        moms = [mean(i2 * i2), mean(i3 * qm), mean(i2 * q2),
                mean(im * q3), mean(q2 * q2),
                mean(i3), mean(i2 * qm), mean(im * q2), mean(q3),
                mean(i2), mean(im * qm), mean(q2), mean(im), mean(qm)]
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (bc, 128), 1)
        acc = jnp.zeros((bc, 128), jnp.float32)
        for k, v in enumerate(moms):
            acc = acc + jnp.where(lane128 == k, v[:, None], 0.0)
        mom_ref[:] = acc

        i_ds = i_ds - corr_ref[:, 0:1]
        q_ds = ((q_ds - corr_ref[:, 1:2]
                 - corr_ref[:, 2:3] * i_ds) * corr_ref[:, 3:4])
    fm = _demod_emit(i_ds, q_ds, prev_ref, last_ref, n_out)

    if not rds:
        hc_ref = sq_hist_ref = rds_hist_ref = None
        carrier_ref = rdsdel_ref = sq_last_ref = rds_last_ref = None
        sqe_s = rdse_s = None
    _band_stages(fm, hb_ref, hc_ref, bank_hist_ref, fmdel_hist_ref,
                 sq_hist_ref, rds_hist_ref, fmd_ref, pilot_ref,
                 stereo_ref, carrier_ref, rdsdel_ref, fm_last_ref,
                 sq_last_ref, rds_last_ref, bext_s, pgb_s, fmd_s, sqe_s,
                 rdse_s, n_out=n_out, delay=delay, rds=rds,
                 mm_dtype=mm_dtype)


def fused_frontend_full(iq_u8: Array, h_rf: Array, h_bank: Array,
                        h_carrier, iq_tail: Array, prev_i: Array,
                        prev_q: Array, bank_tail: Array,
                        mono_delay: Array, carrier_tail, rds_delay,
                        decim: int, *, rds: bool,
                        mm_dtype=jnp.bfloat16, interpret: bool = False,
                        corr=None):
    """One-kernel LTI front half (see ``_kernel_front_full``).

    Contract mirrors the stock ``front_step`` composition exactly
    (fir.block_fir_decim + demod + mix.delay_block + fir.block_fir_bank
    + squaring + carrier block_fir), consuming and producing the same
    FrontState field values.  ``bank_tail`` is the SHARED band-bank
    history ([C, K-1] — the same form ReceiverState carries and
    block_fir_bank's shared-state mode accepts: all band filters read
    the same fm stream).  Returns
    ``(fm_delayed, pilot, stereo, carrier|None, rds_delayed|None,
    new_iq_tail, new_prev_i, new_prev_q, new_bank_tail, new_mono_delay,
    new_carrier_tail|None, new_rds_delay|None)``.

    ``corr``: optional [C, 4] float32 per-channel IQ-correction rows
    ``(dc_i, dc_q, rho, s)`` in the STOCK path's decimated-stream
    units (ops/iqcorr.py), applied to the decimated I/Q in VMEM
    before the demod; the kernel also emits the pre-correction
    conic-fit moments, appending ``mom [C, 14]`` to the return tuple
    (``None`` when ``corr`` is None) — see ``iqcorr.moments`` for why
    the moments must not be computed at raw rate.
    """
    c, bs = iq_u8.shape
    k = h_rf.shape[0]
    n_out = bs // 2 // decim
    kb = h_bank.shape[-1]
    delay = kb // 2
    assert n_out % _T == 0 and n_out >= _T, (n_out, _T)
    assert kb - 1 <= _T and delay <= _T, kb
    w0 = -(-2 * (k - 1) // _T) * _T
    stride = 2 * _T * decim
    assert w0 <= stride, (w0, stride)
    idx, mask = _hraw_plan(k, decim, w0)
    hb_mm = (h_rf * jnp.float32(1.0 / 128.0)).astype(mm_dtype)
    sum_h = 128.0 * jnp.sum(hb_mm.astype(jnp.float32))
    hr = (h_rf[idx] * jnp.asarray(mask)
          * jnp.float32(1.0 / 128.0)).astype(mm_dtype)
    hr = jnp.concatenate([hr[0], hr[1]], axis=-1)    # [W, 2T] merged legs

    bidx, bmask = _hb_plan(kb)
    # runtime-disabling RDS against RDS-capable params is legal (the
    # stock path computes 3 bands and uses 2): keep only the rows the
    # kernel will read
    h_bank = h_bank[:3 if rds else 2]
    assert h_bank.shape[0] == (3 if rds else 2), (h_bank.shape, rds)
    hb = (h_bank[..., bidx] * jnp.asarray(bmask)).astype(mm_dtype)
    hb = jnp.concatenate(list(hb), axis=-1)   # [2T, nb*T] merged bands

    tail_raw, prev = _raw_tail_prev(iq_tail, prev_i, prev_q, k, w0)

    rpad = lambda a: jnp.pad(a, ((0, 0), (_T - a.shape[-1], 0)))  # noqa: E731
    bank_hist = rpad(bank_tail)
    fmdel_hist = rpad(mono_delay)

    ins = [sum_h.reshape(1, 1), iq_u8, tail_raw, prev, hr, hb,
           bank_hist, fmdel_hist]
    per_channel = {1, 2, 3, 6, 7}
    if corr is not None:
        ins.append(corr.astype(jnp.float32))
        per_channel.add(len(ins) - 1)
    if rds:
        hc = (h_carrier[None, bidx] * jnp.asarray(bmask)).astype(mm_dtype)
        base = len(ins)
        ins += [hc, rpad(carrier_tail), rpad(rds_delay)]
        per_channel |= {base + 1, base + 2}

    bc_rows = _BC     # 8 rows for f32 too (Mosaic rejects 4-row tiles;
    #                   the f32 scratch growth is absorbed by the raised
    #                   VMEM limit below)
    c_pad = -(-c // bc_rows) * bc_rows
    if c_pad != c:
        pc = c_pad - c
        ins = [jnp.pad(a, ((0, pc),) + ((0, 0),) * (a.ndim - 1))
               if i in per_channel else a for i, a in enumerate(ins)]

    kern = functools.partial(_kernel_front_full, decim=decim,
                             n_out=n_out, w0=w0, delay=delay, rds=rds,
                             mm_dtype=mm_dtype, corr=corr is not None)
    wlen = stride + w0
    row = lambda: pl.BlockSpec((bc_rows, n_out), lambda i: (i, 0))  # noqa: E731
    tile = lambda: pl.BlockSpec((bc_rows, _T), lambda i: (i, 0))  # noqa: E731
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)  # noqa: E731

    in_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((bc_rows, bs), lambda i: (i, 0)),
                pl.BlockSpec((bc_rows, w0), lambda i: (i, 0)),
                tile(), full(hr), full(hb), tile(), tile()]
    if corr is not None:
        in_specs += [pl.BlockSpec((bc_rows, 4), lambda i: (i, 0))]
    out_specs = [row(), row(), row()]
    out_shape = [jax.ShapeDtypeStruct((c_pad, n_out), jnp.float32)
                 for _ in range(3)]
    if rds:
        in_specs += [full(hc), tile(), tile()]
        out_specs += [row(), row()]
        out_shape += [jax.ShapeDtypeStruct((c_pad, n_out), jnp.float32)
                      for _ in range(2)]
    out_specs += [tile(), tile()]
    out_shape += [jax.ShapeDtypeStruct((c_pad, _T), jnp.float32)] * 2
    if rds:
        out_specs += [tile(), tile()]
        out_shape += [jax.ShapeDtypeStruct((c_pad, _T), jnp.float32)] * 2
    if corr is not None:
        out_specs += [tile()]         # mom: 14 moments in 128 lanes
        out_shape += [jax.ShapeDtypeStruct((c_pad, _T), jnp.float32)]

    scratch = [pltpu.VMEM((bc_rows, w0 + bs), mm_dtype),
               pltpu.VMEM((bc_rows, n_out // _T, wlen), mm_dtype),
               pltpu.VMEM((bc_rows, _T + n_out), mm_dtype),
               pltpu.VMEM((bc_rows, n_out // _T, 2 * _T), mm_dtype),
               pltpu.VMEM((bc_rows, _T + n_out), jnp.float32)]
    if rds:
        scratch += [pltpu.VMEM((bc_rows, _T + n_out), mm_dtype),
                    pltpu.VMEM((bc_rows, _T + n_out), jnp.float32)]

    # the f32 (HIGHEST) variant keeps the 8-row tile (Mosaic rejects
    # 4-row tiles), so its scratch is 2x the bf16 one and exceeds the
    # default 16 MB scoped-VMEM budget; the limit is a compiler default,
    # not the hardware (round-4 probe ran 128 MB) — raise it for f32
    # only so the bf16 serving path keeps its measured pipelining
    cparams = (pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
               if mm_dtype == jnp.float32 else None)
    outs = pl.pallas_call(
        kern, grid=(c_pad // bc_rows,), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch, compiler_params=cparams,
        interpret=interpret)(*ins)

    outs = [o[:c] for o in outs]
    mom = None
    if corr is not None:
        mom = outs[-1][:, :14]
        outs = outs[:-1]
    if rds:
        (fmd, pilot, stereo, carrier, rdsdel,
         last, fm_last, sq_last, rds_last) = outs
    else:
        fmd, pilot, stereo, last, fm_last = outs
        carrier = rdsdel = sq_last = rds_last = None

    new_tail = _new_iq_tail(iq_u8, k)
    new_bank = fm_last[:, _T - (kb - 1):]
    new_mono = fm_last[:, _T - delay:]
    new_carrier = None if sq_last is None else sq_last[:, _T - (kb - 1):]
    new_rdsdel = None if rds_last is None else rds_last[:, _T - delay:]
    return (fmd, pilot, stereo, carrier, rdsdel, new_tail,
            last[:, 0], last[:, 1], new_bank, new_mono, new_carrier,
            new_rdsdel, mom)


def _kernel_front_if(x_i_ref, x_q_ref, prev_ref, hb_ref, bank_hist_ref,
                     fmdel_hist_ref, *args, n_out: int, delay: int,
                     rds: bool, mm_dtype):
    """IF-entry front half in one VMEM pass: per-channel complex
    baseband at the IF rate (e.g. one DFT-filter-bank channel,
    ops/channelizer.py) -> FM demod -> the same post-demod band stages
    as ``_kernel_front_full`` (``_band_stages``).  The RF banded matmul
    is gone — the channelizer already band-limited and decimated — so
    the kernel is demod VPU ops + four decim-1 Toeplitz MXU dots, and
    the fm/squared streams never touch HBM."""
    if rds:
        (hc_ref, sq_hist_ref, rds_hist_ref,
         fmd_ref, pilot_ref, stereo_ref, carrier_ref, rdsdel_ref,
         last_ref, fm_last_ref, sq_last_ref, rds_last_ref,
         bext_s, pgb_s, fmd_s, sqe_s, rdse_s) = args
    else:
        (fmd_ref, pilot_ref, stereo_ref, last_ref, fm_last_ref,
         bext_s, pgb_s, fmd_s) = args
        hc_ref = sq_hist_ref = rds_hist_ref = None
        carrier_ref = rdsdel_ref = sq_last_ref = rds_last_ref = None
        sqe_s = rdse_s = None

    fm = _demod_emit(x_i_ref[:], x_q_ref[:], prev_ref, last_ref, n_out)
    _band_stages(fm, hb_ref, hc_ref, bank_hist_ref, fmdel_hist_ref,
                 sq_hist_ref, rds_hist_ref, fmd_ref, pilot_ref,
                 stereo_ref, carrier_ref, rdsdel_ref, fm_last_ref,
                 sq_last_ref, rds_last_ref, bext_s, pgb_s, fmd_s, sqe_s,
                 rdse_s, n_out=n_out, delay=delay, rds=rds,
                 mm_dtype=mm_dtype)


def fused_frontend_if(i_if: Array, q_if: Array, prev_i: Array,
                      prev_q: Array, h_bank: Array, h_carrier,
                      bank_tail: Array, mono_delay: Array, carrier_tail,
                      rds_delay, *, rds: bool, mm_dtype=jnp.bfloat16,
                      interpret: bool = False):
    """One-kernel IF-entry front half (see ``_kernel_front_if``).

    Contract mirrors the stock ``front_step_if`` composition exactly
    (demod.fm_demod_diff + mix.delay_block + fir.block_fir_bank +
    squaring + carrier block_fir), consuming and producing the same
    FrontState field values (minus the RF ``iq_tail``, which the IF
    path carries through untouched).  ``i_if``/``q_if``: [C, n_out]
    float32.  Returns ``(fm_delayed, pilot, stereo, carrier|None,
    rds_delayed|None, new_prev_i, new_prev_q, new_bank_tail,
    new_mono_delay, new_carrier_tail|None, new_rds_delay|None)``.
    """
    c, n_out = i_if.shape
    kb = h_bank.shape[-1]
    delay = kb // 2
    assert n_out % _T == 0 and n_out >= _T, (n_out, _T)
    assert kb - 1 <= _T and delay <= _T, kb

    bidx, bmask = _hb_plan(kb)
    h_bank = h_bank[:3 if rds else 2]
    assert h_bank.shape[0] == (3 if rds else 2), (h_bank.shape, rds)
    hb = (h_bank[..., bidx] * jnp.asarray(bmask)).astype(mm_dtype)
    hb = jnp.concatenate(list(hb), axis=-1)   # [2T, nb*T] merged bands

    prev = jnp.stack([prev_i, prev_q], axis=-1)
    prev = jnp.pad(prev, ((0, 0), (0, _T - 2)))

    rpad = lambda a: jnp.pad(a, ((0, 0), (_T - a.shape[-1], 0)))  # noqa: E731
    ins = [i_if, q_if, prev, hb, rpad(bank_tail), rpad(mono_delay)]
    if rds:
        hc = (h_carrier[None, bidx] * jnp.asarray(bmask)).astype(mm_dtype)
        ins += [hc, rpad(carrier_tail), rpad(rds_delay)]

    bc_rows = _BC     # 8 rows for f32 too (Mosaic rejects 4-row tiles)
    c_pad = -(-c // bc_rows) * bc_rows
    if c_pad != c:
        pc = c_pad - c
        per_channel = {0, 1, 2, 4, 5} | ({7, 8} if rds else set())
        ins = [jnp.pad(a, ((0, pc),) + ((0, 0),) * (a.ndim - 1))
               if i in per_channel else a for i, a in enumerate(ins)]

    kern = functools.partial(_kernel_front_if, n_out=n_out, delay=delay,
                             rds=rds, mm_dtype=mm_dtype)
    row = lambda: pl.BlockSpec((bc_rows, n_out), lambda i: (i, 0))  # noqa: E731
    tile = lambda: pl.BlockSpec((bc_rows, _T), lambda i: (i, 0))  # noqa: E731
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)  # noqa: E731

    in_specs = [row(), row(), tile(), full(hb), tile(), tile()]
    out_specs = [row(), row(), row()]
    out_shape = [jax.ShapeDtypeStruct((c_pad, n_out), jnp.float32)
                 for _ in range(3)]
    if rds:
        in_specs += [full(ins[6]), tile(), tile()]
        out_specs += [row(), row()]
        out_shape += [jax.ShapeDtypeStruct((c_pad, n_out), jnp.float32)
                      for _ in range(2)]
    out_specs += [tile(), tile()]
    out_shape += [jax.ShapeDtypeStruct((c_pad, _T), jnp.float32)] * 2
    if rds:
        out_specs += [tile(), tile()]
        out_shape += [jax.ShapeDtypeStruct((c_pad, _T), jnp.float32)] * 2

    scratch = [pltpu.VMEM((bc_rows, _T + n_out), mm_dtype),
               pltpu.VMEM((bc_rows, n_out // _T, 2 * _T), mm_dtype),
               pltpu.VMEM((bc_rows, _T + n_out), jnp.float32)]
    if rds:
        scratch += [pltpu.VMEM((bc_rows, _T + n_out), mm_dtype),
                    pltpu.VMEM((bc_rows, _T + n_out), jnp.float32)]

    # the f32 (HIGHEST) variant keeps the 8-row tile (Mosaic rejects
    # 4-row tiles), so its scratch is 2x the bf16 one and exceeds the
    # default 16 MB scoped-VMEM budget; the limit is a compiler default,
    # not the hardware (round-4 probe ran 128 MB) — raise it for f32
    # only so the bf16 serving path keeps its measured pipelining
    cparams = (pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
               if mm_dtype == jnp.float32 else None)
    outs = pl.pallas_call(
        kern, grid=(c_pad // bc_rows,), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch, compiler_params=cparams,
        interpret=interpret)(*ins)

    outs = [o[:c] for o in outs]
    if rds:
        (fmd, pilot, stereo, carrier, rdsdel,
         last, fm_last, sq_last, rds_last) = outs
    else:
        fmd, pilot, stereo, last, fm_last = outs
        carrier = rdsdel = sq_last = rds_last = None

    new_bank = fm_last[:, _T - (kb - 1):]
    new_mono = fm_last[:, _T - delay:]
    new_carrier = None if sq_last is None else sq_last[:, _T - (kb - 1):]
    new_rdsdel = None if rds_last is None else rds_last[:, _T - delay:]
    return (fmd, pilot, stereo, carrier, rdsdel, last[:, 0], last[:, 1],
            new_bank, new_mono, new_carrier, new_rdsdel)


def fused_frontend(iq_u8: Array, h: Array, iq_tail: Array, prev_i: Array,
                   prev_q: Array, decim: int, *,
                   mm_dtype=jnp.bfloat16,
                   interpret: bool = False
                   ) -> tuple[Array, Array, Array, Array]:
    """u8 IQ block -> (fm, new_iq_tail, new_prev_i, new_prev_q).

    Drop-in for the front of ``receiver.front_step``: semantics of
    normalize + ``fir.block_fir_decim(.., decim)`` on both legs +
    ``demod.fm_demod_diff`` (src/iofunc.cpp:113-120, filter.cpp:123-140,
    85-102).  ``iq_u8``: [C, block], ``iq_tail``: [C, 2, K-1] f32 raw-rate
    history, ``prev_i/q``: [C].
    """
    c, bs = iq_u8.shape
    k = h.shape[0]
    n_iq = bs // 2
    n_out = n_iq // decim
    assert n_out % _T == 0, (n_out, _T)
    assert (k - 1) % decim == 0, (k, decim)
    s_ph = (k - 1) // decim
    assert s_ph <= _T, (s_ph, _T)
    idx, mask = _hg_plan(k, decim)
    hg = h[idx] * jnp.asarray(mask)                   # [D*2T, T]

    # phase pre-split at u8 rate (the only pre-kernel HBM traffic);
    # phase dims go LEADING so the kernel only ever slab-selects
    x20 = iq_u8.reshape(c, n_out, 2 * decim)
    x20 = jnp.transpose(x20, (2, 0, 1))               # [2D, C, M]
    # tail phases: tail[c, leg, D*u + r] -> [leg, r, c, u], right-aligned
    # into a full lane tile so the in-kernel store stays 128-aligned
    tailph = iq_tail.reshape(c, 2, s_ph, decim)
    tailph = jnp.transpose(tailph, (1, 3, 0, 2))      # [2, D, C, S/D]
    tailph = jnp.pad(tailph, ((0, 0), (0, 0), (0, 0), (_T - s_ph, 0)))
    prev = jnp.stack([prev_i, prev_q], axis=-1)       # [C, 2]
    prev = jnp.pad(prev, ((0, 0), (0, _T - 2)))       # lanes 0/1 used

    c_pad = -(-c // _BC) * _BC
    if c_pad != c:
        pc = c_pad - c
        x20 = jnp.pad(x20, ((0, 0), (0, pc), (0, 0)))
        tailph = jnp.pad(tailph, ((0, 0), (0, 0), (0, pc), (0, 0)))
        prev = jnp.pad(prev, ((0, pc), (0, 0)))

    kern = functools.partial(_kernel, decim=decim, n_out=n_out,
                             mm_dtype=mm_dtype)
    fm, last = pl.pallas_call(
        kern,
        grid=(c_pad // _BC,),
        in_specs=[
            pl.BlockSpec((2 * decim, _BC, n_out), lambda i: (0, i, 0)),
            pl.BlockSpec((2, decim, _BC, _T), lambda i: (0, 0, i, 0)),
            pl.BlockSpec((_BC, _T), lambda i: (i, 0)),
            pl.BlockSpec((decim * 2 * _T, _T), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_BC, n_out), lambda i: (i, 0)),
            pl.BlockSpec((_BC, _T), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_pad, n_out), jnp.float32),
            jax.ShapeDtypeStruct((c_pad, _T), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_BC, _T + n_out), mm_dtype),
            pltpu.VMEM((_BC, n_out // _T, decim * 2 * _T), mm_dtype),
            pltpu.VMEM((2 * decim, _BC, n_out), mm_dtype),
        ],
        interpret=interpret,
    )(x20, tailph, prev, hg)
    fm, last = fm[:c], last[:c]

    # new raw-rate tail from the block's last K-1 IQ pairs (u8-rate read
    # of 2(K-1) bytes/channel — negligible)
    new_tail = _new_iq_tail(iq_u8, k)
    return fm, new_tail, last[:, 0], last[:, 1]
