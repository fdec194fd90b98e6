"""Pallas TPU kernel for the PLL phase recurrence.

The PLL scan (``ops/pll.py``, reference src/filter.cpp:174-228) is the
one stage of the receiver that cannot batch over time: ~13 dependent VPU
ops per IF sample.  As an XLA ``lax.scan`` each step pays loop overhead
(dynamic-update-slice of the output, index bookkeeping) that dominates
the arithmetic — measured ~560 ns/step for a [C=512, 2-lane] carry that
needs only ~40 VPU cycles (~45 ns).  This kernel runs the identical
recurrence as a ``fori_loop`` over a time-major [T, 8, 128] VMEM block
with the carry held in registers, so each step is just the dependency
chain itself.

Two input flavours share the kernel:

* **sign** — f32 samples; the phase-detector target is ``pi*[x<0]`` with
  the ``x==0`` guard (the fast path of ``pll.pll``).
* **coded** — int8 sign codes (POS/NEG/ZERO/INVALID, ``pll.encode_sign``)
  with INVALID freezing the carry — the gathered-stream replay of the
  exact time-sharded receiver (``pll.phase_scan_coded``), which also
  needs the carry snapshot after ``split_at`` samples; the kernel emits
  it from the scratch when the (sequential) grid crosses that boundary.

Layout contract (see /opt/skills/guides/pallas_guide.md):

* The caller reshapes the [batch..., N] input time-major to
  [N, S, 128] — one (sublane, lane) vreg slab per time step — and pads
  the flattened batch to a multiple of 8*128.  The relayout is two XLA
  transposes at IF rate (HBM-bound, ~ms) vs the tens-of-ms scan win.
* Grid = time chunks; the carry persists across the sequential TPU grid
  in a VMEM scratch, so arbitrarily long streams need only one kernel.
* Per-stream loop constants (kp, ki, dtheta) enter as [S, 128] vregs —
  the stereo-pilot and RDS-carrier loop configurations stay lane-stacked
  exactly as in the XLA path.

Numerics: the kernel body IS ``pll._make_step`` — the same closure the
XLA scan traces — so the emitted phase sequence and the carried state
are bit-identical to the scan path (pinned in tests/test_pll_pallas.py;
the exact time-sharded receiver relies on this).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128
_SUBLANES = 8

# mirrored from ops/pll.py (import would be circular)
_CODE_NEG = 1
_CODE_ZERO = 2
_CODE_INVALID = 3


def _kernel(x_ref, kp_ref, ki_ref, dth_ref, carry_ref, *refs, chunk: int,
            make_step, mode: str, split_idx: int, emit_integ: bool,
            expand: int):
    """One time chunk: x [T, S, L] -> phi [T, S, L]; carry [3, S, L]
    lives in ``carry_s`` scratch across the (sequential) grid.  When the
    grid reaches ``split_idx`` the pre-chunk carry is snapshotted to
    ``mid_ref`` (the coded path's resume state).  ``emit_integ`` adds a
    second [T, S, L] output carrying the pre-update integrator (the span
    PLL's within-span reconstruction needs it, ops/pll.py).

    ``mode``: "sign" (f32 samples, target = pi*[x<0]), "coded" (int8
    sign codes), or "target" (f32 detector target phases directly — the
    span PLL's averaged detector; NaN marks a dead span -> err 0).

    ``expand`` (target mode only): emit the ``expand`` within-span
    phases per step straight from the kernel (the ops mirror
    ``pll._span_expand`` exactly so scan and kernel stay bit-identical)
    instead of per-span (phi0, i0) rows — kills the separate XLA
    expansion pass (one IF-rate HBM round trip).  The K stores are off
    the carry dependency chain."""
    coded = mode == "coded"
    if emit_integ:
        phi_ref, i0_ref, mid_ref, out_ref, carry_s, *scratch = refs
    else:
        phi_ref, mid_ref, out_ref, carry_s, *scratch = refs
        i0_ref = None
    first = pl.program_id(0) == 0
    last = pl.program_id(0) == pl.num_programs(0) - 1

    @pl.when(first)
    def _():
        carry_s[:] = carry_ref[:]
        mid_ref[:] = carry_ref[:]   # defined even if split never fires

    @pl.when(pl.program_id(0) == split_idx)
    def _():
        mid_ref[:] = carry_s[:]

    if coded:
        # int8 rows inside a (32,128)-tiled block confuse Mosaic's mask
        # layouts; convert the whole chunk to f32 scratch once (native-
        # tiled, vectorized) and loop over f32 rows instead
        xf_s, = scratch
        xf_s[:] = x_ref[:].astype(jnp.int32).astype(jnp.float32)
        x_rows = xf_s
    else:
        x_rows = x_ref

    step = make_step(kp_ref[:], ki_ref[:], dth_ref[:])
    pi = jnp.float32(jnp.pi)
    f_neg = jnp.float32(_CODE_NEG)
    f_zero = jnp.float32(_CODE_ZERO)
    f_invalid = jnp.float32(_CODE_INVALID)

    def body(t, c):
        x = x_rows[t]
        if emit_integ:
            i0_ref[t] = c[0]
        if coded:
            tk = jnp.where(x == f_neg, pi, jnp.float32(0.0))
            zk = x == f_zero
            valid = x != f_invalid
            (i2, p2, a2), phi = step(c, (tk, zk))
            i0, p0, a0 = c
            c2 = (jnp.where(valid, i2, i0), jnp.where(valid, p2, p0),
                  jnp.where(valid, a2, a0))
        elif mode == "target":
            zk = x != x                      # NaN = dead span -> err 0
            c2, phi = step(c, (x, zk))
            if expand:
                # within-span reconstruction, op-for-op _span_expand
                two_pi = jnp.float32(2.0 * jnp.pi)
                inv_two_pi = jnp.float32(1.0 / (2.0 * jnp.pi))
                v = x - phi + pi
                err = v - two_pi * jnp.floor(v * inv_two_pi) - pi
                err = jnp.where(zk, jnp.float32(0.0), err)
                lin = dth_ref[:] + kp_ref[:] * err + c[0]
                quad = ki_ref[:] * err
                for j in range(expand):
                    jf = jnp.float32(j)
                    tri = jnp.float32(j * (j + 1) / 2.0)
                    phi_ref[t * expand + j] = phi + jf * lin + tri * quad
        else:
            tk = jnp.where(x < 0, pi, jnp.float32(0.0))
            zk = x == 0.0
            c2, phi = step(c, (tk, zk))
        if not expand:
            phi_ref[t] = phi
        return c2

    # NOTE: Mosaic's fori lowering only supports unroll=1 or full unroll
    integ, pe, ang = jax.lax.fori_loop(
        0, chunk, body, (carry_s[0], carry_s[1], carry_s[2]))
    carry_s[0] = integ
    carry_s[1] = pe
    carry_s[2] = ang

    @pl.when(last)
    def _():
        out_ref[:] = carry_s[:]


def _pick_chunk(n: int, align: int, s: int, target: int = 512,
                rows_per_step: int = 2) -> int:
    """Largest d <= target with d | n and d | align (so the split lands
    on a chunk boundary), capped so the double-buffered in/out blocks fit
    the ~16 MB VMEM scope (2 x rows_per_step x chunk x s x 128 x 4B +
    carries; rows_per_step = input rows + output rows per time step)."""
    budget = 12 * 1024 * 1024
    target = min(target,
                 max(1, budget // (2 * rows_per_step * s * _LANES * 4)))
    g = math.gcd(n, align) if align else n
    best = 1
    for d in range(1, target + 1):
        if g % d == 0:
            best = d
    return best


def _phase_scan_time_major(x_t: Array, kp: Array, ki: Array, dtheta: Array,
                           carry: tuple[Array, Array, Array], make_step,
                           *, mode: str, split_at: int,
                           emit_integ: bool = False, expand: int = 0,
                           interpret: bool = False):
    """[N, S, 128] time-major core.  Returns (phi, carry_mid, carry_end),
    or (phi, i0, carry_mid, carry_end) with ``emit_integ``; ``carry_mid``
    is the state after ``split_at`` samples (== the input carry when
    split_at is 0 or never reached).  With ``expand`` = K > 0 (target
    mode) the phi output has K rows per input row — the within-span
    phases emitted in-kernel."""
    n, s, l = x_t.shape
    assert l == _LANES and s % _SUBLANES == 0, (s, l)
    chunk = _pick_chunk(n, split_at, s,
                        rows_per_step=1 + max(expand, 1) + emit_integ)
    split_idx = split_at // chunk if split_at else 0
    carry_arr = jnp.stack(carry)                        # [3, S, L]

    kern = functools.partial(_kernel, chunk=chunk, make_step=make_step,
                             mode=mode, split_idx=split_idx,
                             emit_integ=emit_integ, expand=expand)
    full = lambda i: (0, 0)                             # noqa: E731
    full3 = lambda i: (0, 0, 0)                         # noqa: E731
    row_spec = pl.BlockSpec((chunk, s, l), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    row_shape = jax.ShapeDtypeStruct((n, s, l), jnp.float32)
    ex = max(expand, 1)
    phi_spec = pl.BlockSpec((chunk * ex, s, l), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    phi_shape = jax.ShapeDtypeStruct((n * ex, s, l), jnp.float32)
    n_rows = 2 if emit_integ else 1
    outs = pl.pallas_call(
        kern,
        grid=(n // chunk,),
        in_specs=[
            row_spec,
            pl.BlockSpec((s, l), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, l), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, l), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, s, l), full3, memory_space=pltpu.VMEM),
        ],
        out_specs=[phi_spec] + [row_spec] * (n_rows - 1) + [
            pl.BlockSpec((3, s, l), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, s, l), full3, memory_space=pltpu.VMEM),
        ],
        out_shape=[phi_shape] + [row_shape] * (n_rows - 1) + [
            jax.ShapeDtypeStruct((3, s, l), jnp.float32),
            jax.ShapeDtypeStruct((3, s, l), jnp.float32),
        ],
        scratch_shapes=([pltpu.VMEM((3, s, l), jnp.float32)]
                        + ([pltpu.VMEM((chunk, s, l), jnp.float32)]
                           if mode == "coded" else [])),
        interpret=interpret,
    )(x_t, kp, ki, dtheta, carry_arr)
    *rows, mid, carry_out = outs
    unpack = lambda a: (a[0], a[1], a[2])               # noqa: E731
    return (*rows, unpack(mid), unpack(carry_out))


class _Slab:
    """Batch-major [..., N] <-> time-major [N, S, 128] relayout helper."""

    def __init__(self, batch: tuple[int, ...]):
        self.batch = batch
        flat = 1
        for d in batch:
            flat *= d
        self.flat = flat
        tile = _SUBLANES * _LANES
        self.pad = (-flat) % tile
        self.s = (flat + self.pad) // _LANES

    def consts(self, a, dtype=jnp.float32):
        a = jnp.broadcast_to(jnp.asarray(a, dtype), self.batch)
        a = a.reshape(self.flat)
        if self.pad:
            a = jnp.concatenate([a, jnp.zeros((self.pad,), a.dtype)])
        return a.reshape(self.s, _LANES)

    def to_time_major(self, x, fill=0):
        n = x.shape[-1]
        x = x.reshape(self.flat, n)
        if self.pad:
            x = jnp.concatenate(
                [x, jnp.full((self.pad, n), fill, x.dtype)], axis=0)
        return x.T.reshape(n, self.s, _LANES)

    def from_time_major(self, phi):
        n = phi.shape[0]
        phis = phi.reshape(n, self.s * _LANES)[:, :self.flat]
        return jnp.moveaxis(phis, 0, -1).reshape(*self.batch, n)

    def carry_back(self, c):
        return tuple(a.reshape(self.s * _LANES)[:self.flat]
                     .reshape(self.batch) for a in c)


def phase_scan(pll_in: Array, kp: Array, ki: Array, dtheta: Array,
               carry: tuple[Array, Array, Array], make_step,
               *, emit_integ: bool = False, mode: str = "sign",
               expand: int = 0, interpret: bool = False):
    """Sign/target-path wrapper: ``pll_in`` [..., N] f32 ->
    (phis, carry_end), or (phis, i0s, carry_end) with ``emit_integ``
    (the span-PLL path, ops/pll.py — i0s are the pre-update integrators
    per step; span mode feeds ``mode="target"`` detector phases).  With
    ``expand`` = K (target mode) phis has K samples per input sample —
    the within-span reconstruction done in-kernel.

    ``kp/ki/dtheta`` and the carry fields must broadcast to the batch
    shape ``[...]``; ``make_step(kp, ki, dth)`` is the ``pll._make_step``
    partial (passed in to avoid a circular import and to guarantee the
    op sequence matches the XLA scan).
    """
    slab = _Slab(pll_in.shape[:-1])
    out = _phase_scan_time_major(
        slab.to_time_major(pll_in), slab.consts(kp), slab.consts(ki),
        slab.consts(dtheta), tuple(slab.consts(c) for c in carry),
        make_step, mode=mode, split_at=0, emit_integ=emit_integ,
        expand=expand, interpret=interpret)
    if emit_integ:
        phi, i0, _, end = out
        return (slab.from_time_major(phi), slab.from_time_major(i0),
                slab.carry_back(end))
    phi, _, end = out
    return slab.from_time_major(phi), slab.carry_back(end)


def phase_scan_coded(codes: Array, kp: Array, ki: Array, dtheta: Array,
                     carry: tuple[Array, Array, Array], make_step,
                     *, split_at: int, interpret: bool = False):
    """Coded-path wrapper: ``codes`` [..., M] int8 ->
    (phis, carry_at_split, carry_end) — the Pallas twin of
    ``pll.phase_scan_coded`` (INVALID codes freeze the carry; padding
    lanes are INVALID so they stay inert)."""
    slab = _Slab(codes.shape[:-1])
    phi, mid, end = _phase_scan_time_major(
        slab.to_time_major(codes, fill=_CODE_INVALID),
        slab.consts(kp), slab.consts(ki), slab.consts(dtheta),
        tuple(slab.consts(c) for c in carry),
        make_step, mode="coded", split_at=split_at, interpret=interpret)
    return (slab.from_time_major(phi), slab.carry_back(mid),
            slab.carry_back(end))
