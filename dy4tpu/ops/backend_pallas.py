"""Fused audio back end: NCO mix -> mono+stereo decimating FIR ->
stereo matrix in one VMEM pass.

Replaces the XLA lowering of ``mix.mix(nco, stereo_band)`` +
``fir.block_fir_resample(stack([fm_delayed, stereo_mixed]), up=1,
down=D)`` + ``mix.stereo_matrix`` (the audio half of
``receiver.back_step``, project.cpp:118-133): the mixed stereo stream
and the Toeplitz patches never round-trip HBM.  Only the U=1 modes
(0/1) qualify — the taps*147 polyphase modes keep the XLA path (their
output tiles do not advance by an integer stride per 128 lanes).

Same design rules as ops/frontend_pallas.py: banded Toeplitz dot per
output tile ([W = D*T + w0]-sample windows, aligned bulk + small
overhang stores), histories right-aligned in one 128-lane tile, the
tap pattern carries the decimation.
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


@functools.cache
def _ha_plan(k: int, decim: int, w0: int):
    """Decim-D Toeplitz plan [W, T], W = D*T + w0, history slab w0:
    window position w of tile j holds stream sample j*D*T + w - w0, so
    Ha[w, t] = h[w0 + t*D - w] where 0 <= tap <= k-1."""
    w = np.arange(decim * _T + w0)[:, None]
    t = np.arange(_T)[None, :]
    jp = w0 + t * decim - w
    mask = (jp >= 0) & (jp <= k - 1)
    return np.where(mask, jp, 0).astype(np.int32), mask.astype(np.float32)


def _kernel(fm_ref, sb_ref, nco_ref, mtail_ref, stail_ref, ha_ref,
            mono_ref, left_ref, right_ref, mlast_ref, slast_ref,
            ext_s, pg_s, *, decim: int, n_in: int, w0: int, mm_dtype):
    """One channel tile.  fm/sb/nco [BC, n_in]; tails [BC, T] (raw f32,
    right-aligned); ha [W, T] (mm_dtype) -> mono/left/right [BC, m],
    m = n_in/decim; last-128 stream tiles for the next tails."""
    bc = fm_ref.shape[0]
    stride = decim * _T
    wlen = stride + w0
    m = n_in // decim
    j_tiles = m // _T
    prec = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    outs = []
    for lane in range(2):
        if lane == 0:
            stream = fm_ref[:]
        else:
            stream = 2.0 * nco_ref[:] * sb_ref[:]
        tail = mtail_ref if lane == 0 else stail_ref
        ext_s[:, :w0] = tail[:].astype(mm_dtype)
        ext_s[:, w0:] = stream.astype(mm_dtype)
        (mlast_ref if lane == 0 else slast_ref)[:] = stream[:, n_in - _T:]
        pg_s[:, :, :stride] = ext_s[:, :j_tiles * stride].reshape(
            bc, j_tiles, stride)
        for j in range(j_tiles):
            pg_s[:, j, stride:] = ext_s[:, stride * (j + 1):
                                        stride * (j + 1) + w0]
        y = jnp.dot(pg_s[:].reshape(bc * j_tiles, wlen), ha_ref[:],
                    preferred_element_type=jnp.float32, precision=prec)
        outs.append(y.reshape(bc, m))

    mono, slp = outs
    mono_ref[:] = mono
    left_ref[:] = mono + slp
    right_ref[:] = mono - slp


def fused_backend_ok(n_if: int, audio_up: int, audio_taps: int,
                     audio_per_block: int) -> bool:
    """Geometry gate: U=1, band history within one tile, and an integer
    number of 128-lane output tiles per block."""
    return (audio_up == 1 and audio_taps - 1 <= _T
            and audio_per_block % _T == 0 and n_if % _T == 0)


def fused_audio_backend(fm_delayed: Array, stereo_band: Array, nco: Array,
                        h_audio: Array, mono_tail: Array,
                        stereo_tail: Array, decim: int, *,
                        mm_dtype=jnp.bfloat16,
                        bc_rows: int | None = None,
                        interpret: bool = False
                        ) -> tuple[Array, Array, Array, Array, Array]:
    """Returns ``(mono, left, right, new_mono_tail, new_stereo_tail)`` —
    value-matching the stock mix/resample/matrix composition (fp
    tolerance; tails exact).

    ``bc_rows``: channel rows per grid cell — the tile-invariant plan
    already batches all J output tiles into one dot (M = bc*J = 96 at
    mode 0's geometry).  Round-5 sweep: bc=32 is **-22% standalone**
    (16.5 -> 12.8 ms at C=512 B=48) but **e2e -1.3% on mode 0 /
    neutral on mode 1** — the chain hides the stage in memory-bound
    slots and bigger tiles perturb the schedule, so the serving
    default stays 8 (`DY4TPU_BACKEND_BC` A/Bs it; contrast the
    rational kernels, where bc=32 wins e2e and is the default)."""
    c, n_in = fm_delayed.shape
    k = h_audio.shape[0]
    assert k - 1 <= _T, k
    m = n_in // decim
    assert m % _T == 0 and n_in % _T == 0, (n_in, m)
    w0 = _T
    idx, mask = _ha_plan(k, decim, w0)
    ha = (h_audio[idx] * jnp.asarray(mask)).astype(mm_dtype)

    rpad = lambda a: jnp.pad(a, ((0, 0), (_T - a.shape[-1], 0)))  # noqa: E731
    mtail = rpad(mono_tail)
    stail = rpad(stereo_tail)

    # 8 rows for f32 too: Mosaic rejects 4-row channel tiles; the f32
    # scratch growth rides the raised VMEM limit below
    if bc_rows is None:
        import os
        env = os.environ.get("DY4TPU_BACKEND_BC")
        bc_rows = int(env) if env else _BC
    c_pad = -(-c // bc_rows) * bc_rows
    args = [fm_delayed, stereo_band, nco, mtail, stail]
    if c_pad != c:
        pc = c_pad - c
        args = [jnp.pad(a, ((0, pc), (0, 0))) for a in args]

    kern = functools.partial(_kernel, decim=decim, n_in=n_in, w0=w0,
                             mm_dtype=mm_dtype)
    wlen = decim * _T + w0
    row_in = lambda: pl.BlockSpec((bc_rows, n_in), lambda i: (i, 0))  # noqa: E731
    tile = lambda: pl.BlockSpec((bc_rows, _T), lambda i: (i, 0))  # noqa: E731
    outs = pl.pallas_call(
        kern, grid=(c_pad // bc_rows,),
        in_specs=[row_in(), row_in(), row_in(), tile(), tile(),
                  pl.BlockSpec(ha.shape, lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((bc_rows, m), lambda i: (i, 0))] * 3
        + [tile(), tile()],
        out_shape=[jax.ShapeDtypeStruct((c_pad, m), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((c_pad, _T), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((bc_rows, w0 + n_in), mm_dtype),
                        pltpu.VMEM((bc_rows, m // _T, wlen), mm_dtype)],
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20)
            if mm_dtype == jnp.float32 else None),
        interpret=interpret,
    )(*args, ha)
    mono, left, right, mlast, slast = (o[:c] for o in outs)
    s = k - 1
    return mono, left, right, mlast[:, _T - s:], slast[:, _T - s:]
