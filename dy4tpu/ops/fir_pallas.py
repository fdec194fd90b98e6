"""Pallas TPU kernel: fused decimating FIR (the RF front-end hot op).

The reference's hottest loop is the RF decimating convolution
(``downsampleBlockConvolveFIR`` src/filter.cpp:123-140; 1.6-2.85 s/capture
on the RPi, Final Report p.11).  ``ops/fir.py`` already gives an MXU
matmul lowering with a ~W/K FLOP inflation; this kernel is the
inflation-free VPU alternative: true K multiply-accumulates per output,
one HBM read of the input, accumulation in VMEM registers.

Layout: the input is polyphase-split outside the kernel
(``x_ph[b, r, u] = x_ext[u*D + r]`` — a cheap XLA transpose) so every tap
access inside the kernel is a contiguous lane slice:

    y[m] = sum_{r<D} sum_{q<ceil(K/D)} h[K-1-(qD+r)] * x_ph[b, r, m+q]

Grid: (batch/8, M/128); each cell DMAs its [8, D, 128+Q] window from HBM
into VMEM scratch and runs K fused multiply-adds on [8, 128] tiles.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BM = 128   # output-tile length (lanes)
_BB = 8     # batch-tile (sublanes)


def _kernel(x_ref, h_ref, o_ref, xv, sems, *, down: int, q_taps: int,
            k: int, n_tiles: int):
    """One batch-tile per grid cell; walks the time axis with
    double-buffered HBM->VMEM DMA (guide pattern), so copy-in of tile
    j+1 overlaps the K multiply-adds of tile j.  The loop is unrolled in
    slot *pairs* to keep the scratch-buffer index static."""
    i = pl.program_id(0)

    def get_dma(slot, j):
        # window start/length aligned to the (8, 128) HBM tiling: phases
        # lead, batch tile is 8-aligned, lane window is a full 2*_BM slab
        return pltpu.make_async_copy(
            x_ref.at[:, pl.ds(i * _BB, _BB), pl.ds(j * _BM, 2 * _BM)],
            xv.at[slot], sems.at[slot])

    def compute(slot, j):
        acc = jnp.zeros((_BB, _BM), jnp.float32)
        for r in range(down):
            for q in range(q_taps):
                tap = q * down + r
                if tap < k:
                    acc += h_ref[k - 1 - tap] * xv[slot, r, :, q:q + _BM]
        o_ref[:, pl.ds(j * _BM, _BM)] = acc

    get_dma(0, 0).start()

    def pair(jj, _):
        j0 = 2 * jj

        @pl.when(j0 + 1 < n_tiles)
        def _():
            get_dma(1, j0 + 1).start()

        get_dma(0, j0).wait()
        compute(0, j0)

        @pl.when(j0 + 1 < n_tiles)
        def _():
            @pl.when(j0 + 2 < n_tiles)
            def _():
                get_dma(0, j0 + 2).start()

            get_dma(1, j0 + 1).wait()
            compute(1, j0 + 1)

        return 0

    jax.lax.fori_loop(0, -(-n_tiles // 2), pair, 0)


def block_fir_decim_pallas(x: Array, h: Array, state: Array, down: int, *,
                           interpret: bool = False) -> tuple[Array, Array]:
    """Stateful decimating FIR via the Pallas kernel.

    Semantics identical to ``fir.block_fir_decim`` (overlap-save state =
    last K-1 inputs).  ``x``: [..., N] float32 with N divisible by
    ``down``; ``h``: [K]; ``state``: [..., K-1].
    """
    k = h.shape[0]
    n = x.shape[-1]
    if state.shape[-1] != k - 1:
        raise ValueError(f"state length {state.shape[-1]} != {k - 1}")
    if n % down:
        raise ValueError(f"block length {n} not divisible by {down}")
    m = n // down
    batch_shape = x.shape[:-1]
    b = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1

    x_ext = jnp.concatenate([state, x], axis=-1).reshape(b, k - 1 + n)
    q_taps = -(-k // down)                       # ceil(K / D)
    if q_taps > _BM:
        raise ValueError(f"K/down = {q_taps} exceeds window margin {_BM}")
    m_pad = -(-m // _BM) * _BM
    b_pad = -(-b // _BB) * _BB
    lp = m_pad + _BM                             # phase-array length
    x_full = jnp.pad(x_ext, ((0, b_pad - b),
                             (0, lp * down - x_ext.shape[-1])))
    # polyphase split, phase-major: x_ph[r, b, u] = x_ext[b, u*down + r]
    x_ph = jnp.moveaxis(x_full.reshape(b_pad, lp, down), -1, 0)

    n_tiles = m_pad // _BM
    kern = functools.partial(_kernel, down=down, q_taps=q_taps, k=k,
                             n_tiles=n_tiles)
    y = pl.pallas_call(
        kern,
        grid=(b_pad // _BB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_BB, m_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, down, _BB, 2 * _BM), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_ph, h.astype(jnp.float32))
    y = y[:b, :m].reshape((*batch_shape, m))
    new_state = x[..., n - (k - 1):]
    return y, new_state
