"""Sharded streaming receiver: channels x time over a device mesh.

Replaces the reference's two-thread pipeline + mutex queue
(src/project.cpp:289-305, src/threadSafeQ.cpp) with SPMD over a
``(ch, time)`` mesh:

* **ch axis** — independent IQ channels, pure data parallelism.
* **time axis** — consecutive chunks of the *same* stream processed
  concurrently.  Consistency comes from the structure of the receiver's
  carried state (SURVEY.md §2.4): every FIR/delay/resampler state is a
  trailing window of that stage's input stream, so it is reproduced
  exactly by prepending an input *halo* — the last ``overlap_blocks``
  blocks of the left neighbour's raw IQ, fetched with one
  ``lax.ppermute`` — and discarding the warm-up outputs.  The only
  non-LTI carries (PLL phase, CDR timing) re-lock inside the warm-up
  region: PLL lock takes < 1k IF samples (spec p.10 Fig.7) while one
  mode-0 block spans 7680, so post-warm-up outputs converge to the
  sequential trajectory.  ``overlap_blocks`` trades redundant FLOPs
  (O/(S+O)) for lock margin.

Across successive ``step`` calls the stream keeps flowing: the global
tail of call *k*'s IQ seeds shard 0's halo at call *k+1*, and each
shard's end-state seeds itself (states are only a warm-start; exactness
comes from the halo).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dy4tpu.config import ModeConfig
from dy4tpu.parallel.mesh import CH_AXIS, TIME_AXIS
from dy4tpu.pipeline import receiver

shard_map = jax.shard_map

Array = jax.Array


class ShardedOutputs(NamedTuple):
    mono: Array          # [C, T*S*audio_per_block]
    left: Array
    right: Array
    pcm: Array           # [C, out_len] int16 (interleaved if stereo)
    rds_symbols: Array | None   # [C, T*S*symbols_per_block] int8
    rds_resync: Array | None    # [C, T*S] bool, per block
    rds_offset: Array | None    # [C, T*S] int32 CDR phase, per block


class ShardedCarry(NamedTuple):
    """Streaming carry across step() calls."""
    state: receiver.ReceiverState   # batched [T_shards, C, ...]
    prev_tail: Array                # [C, H] u8 — global stream tail


class ShardedReceiver:
    """Receiver over a ``(ch, time)`` mesh.

    One ``step`` consumes ``chunk_len = T * shard_blocks * block_size``
    interleaved u8 IQ samples per channel and emits the matching audio and
    RDS symbol streams, sharded the same way.
    """

    def __init__(self, cfg: ModeConfig, mesh: Mesh, *,
                 shard_blocks: int = 4, overlap_blocks: int = 1,
                 stereo: bool = True,
                 precision=lax.Precision.HIGHEST):
        if TIME_AXIS not in mesh.shape or CH_AXIS not in mesh.shape:
            raise ValueError(f"mesh must have axes ({CH_AXIS},{TIME_AXIS})")
        self.cfg = cfg
        self.mesh = mesh
        self.t_shards = mesh.shape[TIME_AXIS]
        self.ch_shards = mesh.shape[CH_AXIS]
        self.shard_blocks = shard_blocks
        self.overlap_blocks = overlap_blocks
        self.stereo = stereo
        self.precision = precision
        self.halo_len = overlap_blocks * cfg.block_size
        self.chunk_len = self.t_shards * shard_blocks * cfg.block_size
        self._step = self._build()

    # ---- public API ----

    def init(self, channels: int) -> ShardedCarry:
        if channels % self.ch_shards:
            raise ValueError(f"channels {channels} not divisible by "
                             f"ch axis {self.ch_shards}")
        self.channels = channels
        state = receiver.init_state(self.cfg, batch=(self.t_shards, channels))
        # distinct host buffers per leaf: equal on-device constants can be
        # deduped into one buffer, which breaks donation in step()
        state = jax.tree.map(lambda a: np.array(a), state)
        state = jax.device_put(state, self._sharding_for_state())
        prev_tail = jax.device_put(
            np.full((channels, self.halo_len), 128, np.uint8),
            NamedSharding(self.mesh, P(CH_AXIS, None)))
        return ShardedCarry(state=state, prev_tail=prev_tail)

    def step(self, params: receiver.ReceiverParams, carry: ShardedCarry,
             iq_u8: Array) -> tuple[ShardedCarry, ShardedOutputs]:
        """iq_u8: [C, chunk_len] uint8, ideally already placed with
        ``input_sharding()``."""
        return self._step(params, carry, iq_u8)

    def input_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(CH_AXIS, TIME_AXIS))

    # ---- internals ----

    def _sharding_for_state(self):
        spec = NamedSharding(self.mesh, P(TIME_AXIS, CH_AXIS))
        return jax.tree.map(lambda _: spec, receiver.init_state(
            self.cfg, batch=(self.t_shards, 2)))

    def _build(self):
        cfg = self.cfg
        t_shards = self.t_shards
        s_blocks = self.shard_blocks
        o_blocks = self.overlap_blocks
        bs = cfg.block_size
        halo = self.halo_len
        stereo = self.stereo
        precision = self.precision

        state_spec = jax.tree.map(
            lambda _: P(TIME_AXIS, CH_AXIS),
            receiver.init_state(cfg, batch=(1, 1)))
        params_spec = jax.tree.map(
            lambda _: P(), receiver.make_params(cfg))

        rds_on = cfg.supports_rds
        out_specs = ShardedOutputs(
            mono=P(CH_AXIS, TIME_AXIS), left=P(CH_AXIS, TIME_AXIS),
            right=P(CH_AXIS, TIME_AXIS), pcm=P(CH_AXIS, TIME_AXIS),
            rds_symbols=P(CH_AXIS, TIME_AXIS) if rds_on else None,
            rds_resync=P(CH_AXIS, TIME_AXIS) if rds_on else None,
            rds_offset=P(CH_AXIS, TIME_AXIS) if rds_on else None,
        )

        def local(params, state, prev_tail, iq):
            # state: [1, C_l, ...]; prev_tail: [C_l, H]; iq: [C_l, S*bs]
            state = jax.tree.map(lambda a: a[0], state)
            # halo: last H samples from the left time-neighbour; shard 0
            # takes the carried global tail instead.
            if t_shards > 1:
                nbr = lax.ppermute(iq[..., -halo:], TIME_AXIS,
                                   perm=[(i, i + 1)
                                         for i in range(t_shards - 1)])
                t_idx = lax.axis_index(TIME_AXIS)
                left = jnp.where(t_idx == 0, prev_tail, nbr)
            else:
                left = prev_tail
            ext = jnp.concatenate([left, iq], axis=-1)
            blocks = ext.reshape((*ext.shape[:-1], o_blocks + s_blocks, bs))
            blocks = jnp.moveaxis(blocks, -2, 0)   # [O+S, C_l, bs]

            def body(st, blk):
                st, out = receiver.receiver_step(params, st, blk, cfg,
                                                 precision=precision)
                return st, out

            new_state, outs = lax.scan(body, state, blocks)
            # drop warm-up blocks, flatten block axis into time
            def keep(x):
                if x is None:
                    return None
                x = x[o_blocks:]                    # [S, C_l, ...]
                x = jnp.moveaxis(x, 0, -2)          # [C_l, S, n]
                return x.reshape((*x.shape[:-2], -1))
            mono = keep(outs.mono)
            leftch = keep(outs.left)
            rightch = keep(outs.right)
            if stereo:
                from dy4tpu.ops import mix as mixops
                pcm = mixops.quantize_s16(mixops.interleave(leftch, rightch))
            else:
                from dy4tpu.ops import mix as mixops
                pcm = mixops.quantize_s16(mono)
            syms = keep(outs.rds_symbols)
            if rds_on:
                resync = jnp.moveaxis(outs.rds_resync[o_blocks:], 0, -1)
                offset = jnp.moveaxis(outs.rds_offset[o_blocks:], 0, -1)
            else:
                resync = offset = None
            new_state = jax.tree.map(lambda a: a[None], new_state)
            return (new_state,
                    ShardedOutputs(mono=mono, left=leftch, right=rightch,
                                   pcm=pcm, rds_symbols=syms,
                                   rds_resync=resync, rds_offset=offset))

        mapped = shard_map(
            local, mesh=self.mesh,
            in_specs=(params_spec, state_spec, P(CH_AXIS, None),
                      P(CH_AXIS, TIME_AXIS)),
            out_specs=(state_spec, out_specs),
            check_vma=False,
        )

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, carry: ShardedCarry, iq_u8):
            new_state, outs = mapped(params, carry.state, carry.prev_tail,
                                     iq_u8)
            new_tail = iq_u8[..., -halo:]
            return ShardedCarry(state=new_state, prev_tail=new_tail), outs

        return step
