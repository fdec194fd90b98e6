"""Fused rational-polyphase back ends (the U>1 modes + the RDS IF chain).

Closes VERDICT r2 item 3: ops/backend_pallas.py only qualifies for the
U=1 modes (its single Toeplitz plan needs an integer input stride per
128-lane output tile), so modes 2/3 (audio U/D = 147/800, 147/1280) kept
the stock XLA audio back end, and the RDS 19/120 (mode 0) / 171/640
(mode 2) resampler + RRC stayed unfused in every mode.

Formulation — per-tile banded matrices (reference semantics:
``resampleBlockConvolveFIR`` src/filter.cpp:142-173, state in
input-sample units like ops/fir.block_fir_resample):

    y[mm] = sum_w x_ext[w] * h[(K-1) - (w*U + pad_lo - mm*D)]

For a 128-output tile j the valid input window starts at a position
fractional in U, so no single [W, 128] matrix serves every tile; each
tile gets its own matrix

    M_j[w', t] = h[(K-1) - ((wlo_j + w')*U + pad_lo - (j*128+t)*D)]

(masked to the valid band and to t < m), with ``wlo_j`` rounded DOWN to
a 128-lane boundary so every in-kernel window slice is lane-aligned —
the mask zeroes the pre-window columns, trading <=127 extra masked MACs
per row for zero relayout (the same redundancy-for-alignment trade the
raw front kernel measured 2.1x in favour of, BASELINE.md).  All J
matrices ship as one [J, W, 128] tensor (2-4 MB bf16 for the
receiver's geometries).

State slab trick: the carried tail (s = (K-1)//U <= 128 samples) is
right-aligned in one 128-lane tile, and the plan runs in *slab*
coordinates — state length 128 with ``pad_lo`` shifted by
``-(128-s)*U``.  Positions in the zero padding always index h out of
band, so the mask silently erases them: no per-kernel offset fixups.

Two kernels:

* ``fused_audio_backend_rational`` — NCO mix -> mono+stereo rational
  resampler -> L/R matrix in one VMEM pass (the U>1 twin of
  ``backend_pallas.fused_audio_backend``).
* ``fused_rds_backend`` — quadrature NCO mix (x2 lanes) -> U/D
  resampler -> RRC matched filter in one VMEM pass; the mixed and
  resampled streams never round-trip HBM.  The RRC is decim-1 so its
  Toeplitz tile is tile-invariant ([128+s2, 128]).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_T = 128
_BC = 8
# bf16 serving default for the channel-tile M dim: every per-tile dot
# runs at M = bc_rows (tiles cannot share one matrix), and M=8 leaves
# the MXU pipeline-drain-bound.  Measured (benchmarks/micro_rational.py
# + e2e A/B, round 5): mode-2 chain 13726 -> 14192 MS/s (+3.4%), mode-3
# 13772 -> 14380 (+4.4%) at bc=32 vs 8; bc=64 gains nothing more.
# f32 keeps 8 (doubled per-row scratch, HIGHEST-precision parity path).
_BC_BF16 = 32


def _resolve_bc(bc_rows, mm_dtype) -> int:
    """Channel rows per grid cell: explicit arg > DY4TPU_RATIONAL_BC
    env (A/B knob) > measured per-dtype default."""
    if bc_rows is not None:
        return bc_rows
    import os
    env = os.environ.get("DY4TPU_RATIONAL_BC")
    if env:
        return int(env)
    return _BC if mm_dtype == jnp.float32 else _BC_BF16


@functools.cache
def _tile_plan(k: int, up: int, down: int, pad_lo: int, m: int):
    """Per-tile banded plan in slab coordinates.

    Returns ``(idx [J, W, T] int32, mask [J, W, T] f32, wlo tuple[J],
    W, ext_len)``: tile j's window is ``slab[wlo[j] : wlo[j]+W]``
    (lane-aligned); ``ext_len`` is the zero-padded slab length every
    window stays inside.
    """
    j_tiles = -(-m // _T)
    wlo, whi = [], []
    for j in range(j_tiles):
        mm0 = j * _T
        mm1 = min(m - 1, mm0 + _T - 1)
        lo = max(0, -(-(mm0 * down - pad_lo) // up))    # ceil div
        hi = (mm1 * down + k - 1 - pad_lo) // up
        wlo.append((lo // _T) * _T)                     # lane-align down
        whi.append(hi)
    w_len = max(h - l + 1 for l, h in zip(wlo, whi))
    w_len = -(-w_len // _T) * _T                        # lane-align up
    ext_len = max(l + w_len for l in wlo)

    wlo_a = np.asarray(wlo)[:, None, None]
    w = wlo_a + np.arange(w_len)[None, :, None]         # [J, W, 1]
    mm = (np.arange(j_tiles) * _T)[:, None, None] \
        + np.arange(_T)[None, None, :]                  # [J, 1, T]
    jp = (k - 1) - w * up - pad_lo + mm * down
    mask = (jp >= 0) & (jp <= k - 1) & (mm < m)
    idx = np.where(mask, jp, 0).astype(np.int32)
    return idx, mask.astype(np.float32), tuple(wlo), w_len, ext_len


def _slab_matrices(h: Array, up: int, down: int, m: int, mm_dtype):
    """Banded matrices for a slab whose state occupies the last s of a
    128-lane tile (see module docstring)."""
    k = h.shape[0]
    s = (k - 1) // up
    pad_lo = (k - 1) - s * up - (_T - s) * up           # slab coordinates
    idx, mask, wlo, w_len, ext_len = _tile_plan(k, up, down, pad_lo, m)
    mats = (h[idx] * jnp.asarray(mask)).astype(mm_dtype)
    return mats, wlo, w_len, ext_len


def _prec(mm_dtype):
    return (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _fill_slab(ext_s, tail_ref, stream, *, n_in, ext_len, mm_dtype):
    """slab = [tail tile (128, right-aligned), stream, zero pad]."""
    ext_s[:, :_T] = tail_ref[:].astype(mm_dtype)
    ext_s[:, _T:_T + n_in] = stream.astype(mm_dtype)
    if ext_len > _T + n_in:
        ext_s[:, _T + n_in:] = jnp.zeros(
            (stream.shape[0], ext_len - _T - n_in), mm_dtype)


# ---------------------------------------------------------------------------
# audio back end, rational U (modes 2/3)
# ---------------------------------------------------------------------------

def _audio_kernel(fm_ref, sb_ref, nco_ref, mtail_ref, stail_ref, mats_ref,
                  mono_ref, left_ref, right_ref, mlast_ref, slast_ref,
                  ext_s, *, n_in, ext_len, wlo, w_len, mm_dtype):
    prec = _prec(mm_dtype)
    for lane in range(2):
        if lane == 0:
            stream, tail = fm_ref[:], mtail_ref
        else:
            stream, tail = 2.0 * nco_ref[:] * sb_ref[:], stail_ref
        (mlast_ref if lane == 0 else slast_ref)[:] = stream[:, n_in - _T:]
        _fill_slab(ext_s, tail, stream, n_in=n_in, ext_len=ext_len,
                   mm_dtype=mm_dtype)
        for j in range(len(wlo)):
            y = jnp.dot(ext_s[:, wlo[j]:wlo[j] + w_len], mats_ref[j],
                        preferred_element_type=jnp.float32, precision=prec)
            lo = j * _T
            if lane == 0:
                mono_ref[:, lo:lo + _T] = y
            else:
                mono = mono_ref[:, lo:lo + _T]
                left_ref[:, lo:lo + _T] = mono + y
                right_ref[:, lo:lo + _T] = mono - y


def fused_rational_ok(audio_up: int, audio_taps: int, n_if: int) -> bool:
    """Geometry gate: resampler state fits one 128-lane tile and blocks
    are long enough to refresh it."""
    s = (audio_taps - 1) // audio_up
    return audio_up > 1 and s <= _T and n_if >= _T


def fused_audio_backend_rational(fm_delayed: Array, stereo_band: Array,
                                 nco: Array, h_audio: Array,
                                 mono_tail: Array, stereo_tail: Array,
                                 up: int, down: int, *,
                                 mm_dtype=jnp.bfloat16,
                                 bc_rows: int | None = None,
                                 interpret: bool = False
                                 ) -> tuple[Array, Array, Array, Array,
                                            Array]:
    """U>1 twin of ``backend_pallas.fused_audio_backend``: returns
    ``(mono, left, right, new_mono_tail, new_stereo_tail)``.

    ``bc_rows``: channel rows per grid cell = the M dim of every
    per-tile dot (each 128-output tile has its OWN banded matrix, so
    tiles cannot share one big dot the way the U=1 kernel's
    tile-invariant plan does — more rows per cell is the only way to
    feed the MXU a bigger M); default from ``DY4TPU_RATIONAL_BC`` else
    8 for f32, 32 for bf16 (measured e2e: mode 2 +3.4%, mode 3 +4.4%).
    """
    c, n_in = fm_delayed.shape
    k = h_audio.shape[0]
    s_len = (k - 1) // up
    assert s_len <= _T and n_in >= _T, (s_len, n_in)
    m = n_in * up // down
    mats, wlo, w_len, ext_len = _slab_matrices(h_audio, up, down, m,
                                               mm_dtype)
    out_len = mats.shape[0] * _T

    rpad = lambda a: jnp.pad(a, ((0, 0), (_T - a.shape[-1], 0)))  # noqa: E731
    args = [fm_delayed, stereo_band, nco, rpad(mono_tail),
            rpad(stereo_tail)]
    bc_rows = _resolve_bc(bc_rows, mm_dtype)
    c_pad = -(-c // bc_rows) * bc_rows
    if c_pad != c:
        args = [jnp.pad(a, ((0, c_pad - c), (0, 0))) for a in args]

    kern = functools.partial(_audio_kernel, n_in=n_in, ext_len=ext_len,
                             wlo=wlo, w_len=w_len, mm_dtype=mm_dtype)
    row_in = lambda: pl.BlockSpec((bc_rows, n_in), lambda i: (i, 0))  # noqa: E731
    tile = lambda: pl.BlockSpec((bc_rows, _T), lambda i: (i, 0))  # noqa: E731
    outs = pl.pallas_call(
        kern, grid=(c_pad // bc_rows,),
        in_specs=[row_in(), row_in(), row_in(), tile(), tile(),
                  pl.BlockSpec(mats.shape, lambda i: (0, 0, 0))],
        out_specs=[pl.BlockSpec((bc_rows, out_len), lambda i: (i, 0))] * 3
        + [tile(), tile()],
        out_shape=[jax.ShapeDtypeStruct((c_pad, out_len), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((c_pad, _T), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((bc_rows, ext_len), mm_dtype)],
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20)
            if (mm_dtype == jnp.float32 or bc_rows > _BC) else None),
        interpret=interpret,
    )(*args, mats)
    mono, left, right, mlast, slast = (o[:c] for o in outs)
    return (mono[:, :m], left[:, :m], right[:, :m],
            mlast[:, _T - s_len:], slast[:, _T - s_len:])


# ---------------------------------------------------------------------------
# RDS back end: quadrature mix -> U/D resample -> RRC (all modes with RDS)
# ---------------------------------------------------------------------------

def _rds_kernel(rds_ref, ncoi_ref, ncoq_ref, ltaili_ref, ltailq_ref,
                rtaili_ref, rtailq_ref, mats_ref, rrc_ref,
                bbi_ref, bbq_ref, llasti_ref, llastq_ref, rlasti_ref,
                rlastq_ref, ext_s, y1_s, ext2_s, *,
                n_in, m, ext_len, wlo, w_len, ext2_len, mm_dtype):
    prec = _prec(mm_dtype)
    j2_tiles = -(-m // _T)
    w2_len = rrc_ref.shape[0]
    for lane in range(2):
        nco = ncoi_ref[:] if lane == 0 else ncoq_ref[:]
        stream = nco * rds_ref[:]
        ltail = ltaili_ref if lane == 0 else ltailq_ref
        rtail = rtaili_ref if lane == 0 else rtailq_ref
        (llasti_ref if lane == 0 else llastq_ref)[:] = \
            stream[:, n_in - _T:]
        _fill_slab(ext_s, ltail, stream, n_in=n_in, ext_len=ext_len,
                   mm_dtype=mm_dtype)
        for j in range(len(wlo)):
            y1_s[:, j * _T:(j + 1) * _T] = jnp.dot(
                ext_s[:, wlo[j]:wlo[j] + w_len], mats_ref[j],
                preferred_element_type=jnp.float32, precision=prec)
        (rlasti_ref if lane == 0 else rlastq_ref)[:] = y1_s[:, m - _T:m]
        # RRC over the in-VMEM resampled stream (decim-1, stride = 128)
        _fill_slab(ext2_s, rtail, y1_s[:, :m], n_in=m, ext_len=ext2_len,
                   mm_dtype=mm_dtype)
        out = bbi_ref if lane == 0 else bbq_ref
        for j in range(j2_tiles):
            out[:, j * _T:(j + 1) * _T] = jnp.dot(
                ext2_s[:, j * _T:j * _T + w2_len], rrc_ref[:],
                preferred_element_type=jnp.float32, precision=prec)


def fused_rds_backend_ok(rds_up: int, rds_taps: int, rrc_taps: int,
                         n_if: int, rds_per_block: int) -> bool:
    s = (rds_taps - 1) // rds_up
    return (s <= _T and rrc_taps - 1 <= _T and n_if >= _T
            and rds_per_block >= _T)


def fused_rds_backend(rds_delayed: Array, nco_i: Array, nco_q: Array,
                      h_lpf: Array, h_rrc: Array,
                      lpf_tail_i: Array, lpf_tail_q: Array,
                      rrc_tail_i: Array, rrc_tail_q: Array,
                      up: int, down: int, *, mm_dtype=jnp.bfloat16,
                      bc_rows: int | None = None,
                      interpret: bool = False):
    """Returns ``(bb_i, bb_q, new_lpf_tail_i, new_lpf_tail_q,
    new_rrc_tail_i, new_rrc_tail_q)`` — value-matching the stock
    mix -> block_fir_resample -> block_fir(RRC) composition."""
    c, n_in = rds_delayed.shape
    k = h_lpf.shape[0]
    k2 = h_rrc.shape[0]
    s_len = (k - 1) // up
    s2_len = k2 - 1
    assert s_len <= _T and s2_len <= _T, (s_len, s2_len)
    m = n_in * up // down
    mats, wlo, w_len, ext_len = _slab_matrices(h_lpf, up, down, m,
                                               mm_dtype)
    out_len = mats.shape[0] * _T

    # RRC: decim-1 slab plan degenerates to one tile-invariant matrix
    # (window j starts exactly at lane j*128; band pattern M[w', t] =
    # h2[128 + t - w'] independent of j) — pin the invariance and share
    # tile 0's matrix
    idx2, mask2, wlo2, w2_len, ext2_len = _tile_plan(
        k2, 1, 1, (k2 - 1) - _T, m)
    assert wlo2 == tuple(j * _T for j in range(len(wlo2))), wlo2
    rrc_mat = (h_rrc[idx2[0]] * jnp.asarray(mask2[0])).astype(mm_dtype)

    rpad = lambda a: jnp.pad(a, ((0, 0), (_T - a.shape[-1], 0)))  # noqa: E731
    args = [rds_delayed, nco_i, nco_q, rpad(lpf_tail_i), rpad(lpf_tail_q),
            rpad(rrc_tail_i), rpad(rrc_tail_q)]
    bc_rows = _resolve_bc(bc_rows, mm_dtype)
    c_pad = -(-c // bc_rows) * bc_rows
    if c_pad != c:
        args = [jnp.pad(a, ((0, c_pad - c), (0, 0))) for a in args]

    kern = functools.partial(_rds_kernel, n_in=n_in, m=m, ext_len=ext_len,
                             wlo=wlo, w_len=w_len, ext2_len=ext2_len,
                             mm_dtype=mm_dtype)
    row_in = lambda: pl.BlockSpec((bc_rows, n_in), lambda i: (i, 0))  # noqa: E731
    tile = lambda: pl.BlockSpec((bc_rows, _T), lambda i: (i, 0))  # noqa: E731
    outs = pl.pallas_call(
        kern, grid=(c_pad // bc_rows,),
        in_specs=[row_in(), row_in(), row_in(), tile(), tile(), tile(),
                  tile(),
                  pl.BlockSpec(mats.shape, lambda i: (0, 0, 0)),
                  pl.BlockSpec(rrc_mat.shape, lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((bc_rows, out_len), lambda i: (i, 0))] * 2
        + [tile()] * 4,
        out_shape=[jax.ShapeDtypeStruct((c_pad, out_len), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((c_pad, _T), jnp.float32)] * 4,
        scratch_shapes=[
            pltpu.VMEM((bc_rows, ext_len), mm_dtype),
            pltpu.VMEM((bc_rows, out_len), jnp.float32),
            pltpu.VMEM((bc_rows, ext2_len), mm_dtype)],
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20)
            if (mm_dtype == jnp.float32 or bc_rows > _BC) else None),
        interpret=interpret,
    )(*args, mats, rrc_mat)
    bbi, bbq, llasti, llastq, rlasti, rlastq = (o[:c] for o in outs)
    return (bbi[:, :m], bbq[:, :m],
            llasti[:, _T - s_len:], llastq[:, _T - s_len:],
            rlasti[:, _T - s2_len:], rlastq[:, _T - s2_len:])
