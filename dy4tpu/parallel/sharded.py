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
  ``lax.ppermute`` — and discarding the warm-up outputs.

Two time-sharding disciplines are offered:

* ``exact=True`` (default) — **bit-exact** vs the sequential scan.  The
  receiver is split at its only non-LTI recurrences (``front_step`` /
  PLL / ``back_step``, dy4tpu/pipeline/receiver.py): the FLOP-heavy LTI
  halves run time-parallel with halo warm-up, while the PLL phase
  recurrence — whose input enters only through its *sign* — runs as one
  replicated global scan over an ``all_gather``-ed int8 sign-code stream
  (4 bytes -> 1 byte per IF sample), reproducing the sequential carry
  bit-for-bit; CDR similarly runs replicated over the gathered post-RRC
  baseband at block rate.  The exactness tax is that PLL wall-clock no
  longer shrinks with the time axis — but the PLL is ~8 VPU ops per IF
  sample vs the front end's ~200 MXU MACs per RF sample, so the parallel
  fraction keeps the speedup (measured by ``bench.py`` sharded mode).
* ``exact=False`` (legacy) — PLL/CDR re-lock inside the warm-up region
  (PLL lock < 1k IF samples, spec p.10 Fig.7, vs 7680/block), so
  post-warm-up outputs *converge* to the sequential trajectory instead
  of equalling it.  Cheaper (no gather, per-shard PLL), kept for
  throughput-oriented deployments that tolerate approximate stereo
  during the first blocks of each span.

Across successive ``step`` calls the stream keeps flowing: the global
tail of call *k*'s IQ seeds shard 0's halo at call *k+1*; the exact path
additionally carries the global PLL/CDR states and the last warm-up's
sign codes.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dy4tpu.config import ModeConfig
from dy4tpu.ops import pll
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
    """Streaming carry across step() calls (legacy convergent mode)."""
    state: receiver.ReceiverState   # batched [T_shards, C, ...]
    prev_tail: Array                # [C, H] u8 — global stream tail


class ExactCarry(NamedTuple):
    """Streaming carry for the exact time-sharded mode.

    ``front``/``back`` are per-shard warm-start tails (healed by the halo
    each step); the PLL/CDR fields are the *global* sequential carries.
    """
    front: receiver.FrontState      # leaves [T_shards, C, ...]
    back: receiver.BackState        # leaves [T_shards, C, ...]
    pll_integ: Array                # [C, L]  (L = 2 with RDS, else 1)
    pll_phase: Array                # [C, L]
    pll_angle: Array                # [C, L]
    cdr: receiver.CDRState | None   # [C]
    prev_tail: Array                # [C, H] u8 — global raw-IQ tail
    prev_codes: Array               # [C, L, O*N_if] i8 sign codes of the
    #                                 O blocks preceding this chunk
    started: Array                  # [] bool — False only before the
    #                                 first step (reference nco_q=1 quirk)


def exact_min_halo_if(cfg: ModeConfig) -> int:
    """Minimal sub-block warm-up length (IF samples) that heals every
    LTI state exactly (VERDICT r4 item 3).

    Every carried LTI state is a trailing *stream-value window* (SURVEY
    §2.4; src/project.cpp:240-251 keeps the same invariant) — no IIR
    accumulators — so a warm-up only needs to cover the deepest chain of
    window dependencies, not a whole block:

      rrc_tail <- (rrc_taps-1) RDS samples of the resampled stream, each
      needing (rds_taps-1)/U_rds IF samples of the mixed stream, which
      is the fm stream delayed by (num_taps-1)/2; the carrier chain is
      two cascaded (num_taps-1) windows (band BPF -> squaring -> carrier
      BPF); fm itself reaches ceil((num_taps-1)/decim)+2 IF back through
      the RF FIR + differentiator.

    The result is rounded UP to the per-mode alignment LCM so the
    warm-up mini block satisfies every kernel's geometry: 128-lane
    output tiles for the fused front end, n % 128*D for the U=1 fused
    audio back end, integer output counts for the rational audio/RDS
    resamplers.  Mode 0: 1920 IF = 1/4 block (the one-block halo's
    O/(S+O) = 20% warm-up recompute at S=4 drops to ~6%).
    """
    d = cfg.rf_decim
    kb = cfg.num_taps
    delay = (kb - 1) // 2
    fm_depth = -(-(kb - 1) // d) + 2
    need = max((cfg.audio_taps - 1) // cfg.audio_up + delay,
               2 * (kb - 1))
    if cfg.supports_rds:
        rrc_if = -(-(cfg.rds_rrc_taps - 1) * cfg.rds_down // cfg.rds_up)
        need = max(need,
                   rrc_if + (cfg.rds_taps - 1) // cfg.rds_up + delay)
    need += fm_depth + 8      # stale prev_i/prev_q + slack
    lcm = 128                 # fused front end: n_out % 128
    if cfg.audio_up == 1:
        lcm = math.lcm(lcm, 128 * cfg.audio_down)   # U=1 fused back end
    else:
        lcm = math.lcm(lcm, cfg.audio_down
                       // math.gcd(cfg.audio_up, cfg.audio_down))
    if cfg.supports_rds:
        lcm = math.lcm(lcm, cfg.rds_down
                       // math.gcd(cfg.rds_up, cfg.rds_down))
    halo_if = -(-need // lcm) * lcm
    if halo_if >= cfg.if_per_block:     # degenerate geometry: block halo
        halo_if = -(-halo_if // cfg.if_per_block) * cfg.if_per_block
    return halo_if


class ShardedReceiver:
    """Receiver over a ``(ch, time)`` mesh.

    One ``step`` consumes ``chunk_len = T * shard_blocks * block_size``
    interleaved u8 IQ samples per channel and emits the matching audio and
    RDS symbol streams, sharded the same way.
    """

    def __init__(self, cfg: ModeConfig, mesh: Mesh, *,
                 shard_blocks: int = 4,
                 overlap_blocks: int | None = None,
                 stereo: bool = True, exact: bool = True,
                 precision=lax.Precision.HIGHEST,
                 channel_parallel_replay: bool = True):
        """``overlap_blocks``: warm-up halo size.  ``None`` (default) in
        exact mode picks the minimal sub-block halo
        (``exact_min_halo_if`` — e.g. 1/4 block for mode 0, cutting the
        O/(S+O) warm-up recompute from 20% to ~6% at S=4); an int keeps
        whole-block halos (the pre-round-5 behaviour, and the only
        option for the legacy convergent mode, default 1)."""
        if TIME_AXIS not in mesh.shape or CH_AXIS not in mesh.shape:
            raise ValueError(f"mesh must have axes ({CH_AXIS},{TIME_AXIS})")
        self.cfg = cfg
        self.mesh = mesh
        self.t_shards = mesh.shape[TIME_AXIS]
        self.ch_shards = mesh.shape[CH_AXIS]
        self.shard_blocks = shard_blocks
        self.stereo = stereo
        self.exact = exact
        self.precision = precision
        self.channel_parallel_replay = channel_parallel_replay
        if exact:
            self.halo_if = (exact_min_halo_if(cfg)
                            if overlap_blocks is None
                            else overlap_blocks * cfg.if_per_block)
            self.halo_len = self.halo_if * 2 * cfg.rf_decim
        else:
            if overlap_blocks is None:
                overlap_blocks = 1
            self.halo_if = overlap_blocks * cfg.if_per_block
            self.halo_len = overlap_blocks * cfg.block_size
        self.overlap_blocks = overlap_blocks
        self.chunk_len = self.t_shards * shard_blocks * cfg.block_size
        self.pll_lanes = 2 if cfg.supports_rds else 1
        if exact and self.t_shards * shard_blocks * cfg.if_per_block \
                < self.halo_if:
            raise ValueError("exact mode needs T*shard_blocks blocks >= "
                             "halo (prev-codes carry)")
        self._step = self._build_exact() if exact else self._build()

    # ---- public API ----

    def init(self, channels: int):
        if channels % self.ch_shards:
            raise ValueError(f"channels {channels} not divisible by "
                             f"ch axis {self.ch_shards}")
        self.channels = channels
        # 1x1 mesh: keep everything UNplaced — mesh-sharding annotations
        # on a single-device computation measured +~25 ms/step at the
        # C=256 S=8 point (every carry leaf re-committed to the mesh
        # each iteration); the bare-jit path compiles the same math at
        # 20 ms (benchmarks/micro_sharded.py bisect, round 5)
        if self.t_shards * self.ch_shards == 1:
            dev = jax.devices()[0]
            put_sharded = lambda a, s: jax.device_put(a, dev)  # noqa: E731
        else:
            put_sharded = jax.device_put
        prev_tail = put_sharded(
            np.full((channels, self.halo_len), 128, np.uint8),
            NamedSharding(self.mesh, P(CH_AXIS, None)))
        if not self.exact:
            state = receiver.init_state(self.cfg,
                                        batch=(self.t_shards, channels))
            # distinct host buffers per leaf: equal on-device constants can
            # be deduped into one buffer, which breaks donation in step()
            state = jax.tree.map(lambda a: np.array(a), state)
            state = jax.tree.map(put_sharded, state,
                                 self._sharding_for_state())
            return ShardedCarry(state=state, prev_tail=prev_tail)

        cfg = self.cfg
        st = receiver.init_state(cfg, batch=(self.t_shards, channels))
        front = receiver.front_state_of(st)
        back = receiver.back_state_of(st)
        tspec = NamedSharding(self.mesh, P(TIME_AXIS, CH_AXIS))
        cspec = NamedSharding(self.mesh, P(CH_AXIS))
        rspec = NamedSharding(self.mesh, P())
        put = lambda t, s: jax.tree.map(                # noqa: E731
            put_sharded, jax.tree.map(lambda a: np.array(a), t), s)
        L = self.pll_lanes
        zlc = np.zeros((channels, L), np.float32)
        cdr = None
        if cfg.supports_rds:
            cdr = receiver.CDRState(
                offset=np.zeros((channels,), np.int32),
                found=np.zeros((channels,), bool))
            cdr = jax.tree.map(lambda a: put_sharded(a, cspec), cdr)
        prev_codes = put_sharded(
            np.full((channels, L, self.halo_if),
                    pll.CODE_INVALID, np.int8),
            NamedSharding(self.mesh, P(CH_AXIS, None, None)))
        return ExactCarry(
            front=put(front, jax.tree.map(lambda _: tspec, front)),
            back=put(back, jax.tree.map(lambda _: tspec, back)),
            pll_integ=put_sharded(zlc.copy(), cspec),
            pll_phase=put_sharded(zlc.copy(), cspec),
            pll_angle=put_sharded(zlc.copy(), cspec),
            cdr=cdr, prev_tail=prev_tail, prev_codes=prev_codes,
            started=put_sharded(np.zeros((), bool), rspec))

    def step(self, params: receiver.ReceiverParams, carry,
             iq_u8: Array) -> tuple["ShardedCarry | ExactCarry",
                                    ShardedOutputs]:
        """iq_u8: [C, chunk_len] uint8, ideally already placed with
        ``input_sharding()``."""
        return self._step(params, carry, iq_u8)

    def input_sharding(self):
        if self.t_shards * self.ch_shards == 1:
            return jax.sharding.SingleDeviceSharding(jax.devices()[0])
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

        def make_step(params):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def step_c(carry: ShardedCarry, iq_u8):
                new_state, outs = mapped(params, carry.state,
                                         carry.prev_tail, iq_u8)
                new_tail = iq_u8[..., -halo:]
                return (ShardedCarry(state=new_state, prev_tail=new_tail),
                        outs)
            return step_c

        return self._specialize(make_step)

    def _build_exact(self):
        cfg = self.cfg
        t_shards = self.t_shards
        s_blocks = self.shard_blocks
        bs = cfg.block_size
        n_if = cfg.if_per_block
        halo = self.halo_len          # raw u8 samples (= halo_if * 2 * D)
        halo_if = self.halo_if
        stereo = self.stereo
        precision = self.precision
        rds_on = cfg.supports_rds
        f32 = jnp.float32

        if rds_on:
            freq = np.array([cfg.pll_freq, cfg.rds_pll_freq], np.float32)
            bw = np.array([cfg.pll_bandwidth, cfg.rds_pll_bandwidth],
                          np.float32)
        else:
            freq = np.array([cfg.pll_freq], np.float32)
            bw = np.array([cfg.pll_bandwidth], np.float32)

        st0 = receiver.init_state(cfg, batch=(1, 1))
        front_spec = jax.tree.map(lambda _: P(TIME_AXIS, CH_AXIS),
                                  receiver.front_state_of(st0))
        back_spec = jax.tree.map(lambda _: P(TIME_AXIS, CH_AXIS),
                                 receiver.back_state_of(st0))
        params_spec = jax.tree.map(lambda _: P(), receiver.make_params(cfg))
        cdr_spec = (receiver.CDRState(offset=P(CH_AXIS), found=P(CH_AXIS))
                    if rds_on else None)
        out_specs = ShardedOutputs(
            mono=P(CH_AXIS, TIME_AXIS), left=P(CH_AXIS, TIME_AXIS),
            right=P(CH_AXIS, TIME_AXIS), pcm=P(CH_AXIS, TIME_AXIS),
            rds_symbols=P(CH_AXIS, TIME_AXIS) if rds_on else None,
            rds_resync=P(CH_AXIS, TIME_AXIS) if rds_on else None,
            rds_offset=P(CH_AXIS, TIME_AXIS) if rds_on else None,
        )

        def local(params, front, back, integ, pe, ang, cdr, prev_tail,
                  prev_codes, started, iq):
            from dy4tpu.ops import mix as mixops
            front = jax.tree.map(lambda a: a[0], front)
            back = jax.tree.map(lambda a: a[0], back)
            # t_idx only exists under shard_map; on a 1x1 mesh `local`
            # runs bare under jit (see `mapped` below) with no axis.
            # STATIC 0 there, not jnp.int32(0): a traced zero turns
            # every downstream slice into dynamic-slice (clamps +
            # gathers that block XLA fusion — measured 16 transposes /
            # 8 gathers and 3.5x the bytes-accessed of the same math
            # with static slicing)
            t_idx = lax.axis_index(TIME_AXIS) if t_shards > 1 else 0

            # raw-IQ halo from the left time-neighbour (shard 0: carried
            # global tail) — a sub-block mini warm-up (halo_if IF
            # samples) that heals every front/back state window
            if t_shards > 1:
                nbr = lax.ppermute(iq[..., -halo:], TIME_AXIS,
                                   perm=[(i, i + 1)
                                         for i in range(t_shards - 1)])
                left = jnp.where(t_idx == 0, prev_tail, nbr)
            else:
                left = prev_tail
            mini = left                             # [C_l, halo] u8

            # ---- stage 1: LTI front half, time-parallel ----
            # mini warm-up first, then the S real blocks; every output
            # of the mini is discarded — only the healed states flow on.
            # The mini runs as a LENGTH-1 SCAN of the same body so XLA
            # compiles it as a loop body like the real blocks — a
            # straight call fuses with its consumers and drifts the
            # healed states by 1 ulp (measured on CPU), breaking the
            # bit-exactness bar.  The real blocks are CONTIGUOUS slices
            # of the [C_l, S*bs] chunk taken inside the scan body — the
            # old [C_l,S,bs]->[S,C_l,bs] moveaxis was a raw-u8 HBM
            # relayout (the same class of transpose the front kernel's
            # raw formulation exists to avoid).
            def fbody(st, blk):
                st, fo = receiver.front_step(params, st, blk, cfg,
                                             precision=precision,
                                             rds_enabled=rds_on)
                return st, fo

            front_mini, fo_mini = lax.scan(fbody, front, mini[None])
            fo_mini = jax.tree.map(
                lambda a: None if a is None else a[0], fo_mini,
                is_leaf=lambda a: a is None)

            def fbody_idx(st, i):
                blk = lax.dynamic_slice_in_dim(iq, i * bs, bs, axis=-1)
                return fbody(st, blk)

            new_front, fos = lax.scan(fbody_idx, front_mini,
                                      jnp.arange(s_blocks, dtype=jnp.int32))

            # ---- stage 2: global PLL over gathered sign codes ----
            def to_stream(x):                       # [S, C_l, N] -> [C_l, S*N]
                x = jnp.moveaxis(x, 0, -2)
                return x.reshape((*x.shape[:-2], -1))

            lanes = [fos.pilot]
            if rds_on:
                lanes.append(fos.carrier)
            codes_local = jnp.stack(
                [to_stream(pll.encode_sign(v)) for v in lanes], axis=-2)
            span = halo_if + s_blocks * n_if
            c_l = codes_local.shape[0]
            # The phase replay is a sequential recurrence over time but
            # embarrassingly parallel over channels: instead of every
            # time shard replaying ALL channels over the full chunk
            # (replicated serial fraction — the 1-device tax VERDICT r2
            # item 4 measured at 0.276), re-shard the replay over the
            # time axis BY CHANNEL with one all_to_all each way.  Each
            # shard replays ~C_l/T channels over the full chunk — the
            # serial fraction divides by T — then the per-shard phase
            # spans are redistributed back.  Per-channel float ops are
            # unchanged, so outputs stay bit-exact.  Channel counts that
            # do not divide T are padded with CODE_INVALID lanes (the
            # replay freezes on invalid codes, so pad rows are inert) —
            # the round-4 C_l % T == 0 restriction is gone.
            chan_par = self.channel_parallel_replay and t_shards > 1
            if chan_par:
                cg = -(-c_l // t_shards)
                cp = cg * t_shards - c_l
                pad_c = lambda x, v: (x if cp == 0 else jnp.pad(  # noqa: E731
                    x, ((0, cp),) + ((0, 0),) * (x.ndim - 1),
                    constant_values=v))
                # channel axis 1 (bb [S, C_l, 2, M]) for the CDR replay
                pad_c4 = lambda x, cp_: (x if cp_ == 0 else jnp.pad(  # noqa: E731
                    x, ((0, 0), (0, cp_)) + ((0, 0),) * (x.ndim - 2)))
                codes_p = pad_c(codes_local, pll.CODE_INVALID)
                grp = lambda x: lax.dynamic_slice_in_dim(  # noqa: E731
                    x, t_idx * cg, cg, axis=0)
                codes_grp = lax.all_to_all(
                    codes_p, TIME_AXIS, split_axis=0, concat_axis=2,
                    tiled=True)                     # [cg, L, T*S*N]
                codes_all = jnp.concatenate(
                    [grp(pad_c(prev_codes, pll.CODE_INVALID)), codes_grp],
                    axis=-1)
                # carry_mid = state halo_if samples before the NEXT
                # chunk's start — where the next call's scan must resume
                phis_g, carry_mid_g, _ = pll.phase_scan_coded(
                    codes_all,
                    (grp(pad_c(integ, 0)), grp(pad_c(pe, 0)),
                     grp(pad_c(ang, 0))),
                    freq=freq, fs=cfg.if_fs, norm_bandwidth=bw,
                    split_at=t_shards * s_blocks * n_if)
                spans = jnp.stack(
                    [lax.dynamic_slice_in_dim(phis_g, j * s_blocks * n_if,
                                              span, axis=-1)
                     for j in range(t_shards)], axis=0)  # [T, cg, L, span]
                phis_sh = lax.all_to_all(
                    spans, TIME_AXIS, split_axis=0, concat_axis=1,
                    tiled=True)[0][:c_l]            # [C_l, L, span]
                carry_mid = tuple(
                    lax.all_gather(c, TIME_AXIS, axis=0, tiled=True)[:c_l]
                    for c in carry_mid_g)
                # chunk tail codes (last halo_if samples) live on the
                # last time shard (halo_if <= S*N): masked-psum broadcast
                tail = codes_local[..., -halo_if:].astype(jnp.int32)
                new_prev_codes = lax.psum(
                    jnp.where(t_idx == t_shards - 1, tail, 0),
                    TIME_AXIS).astype(jnp.int8)
            else:
                codes_chunk = (lax.all_gather(codes_local, TIME_AXIS,
                                              axis=-1, tiled=True)
                               if t_shards > 1 else
                               codes_local)        # [C_l, L, T*S*N]
                codes_all = jnp.concatenate([prev_codes, codes_chunk],
                                            axis=-1)
                phis, carry_mid, _ = pll.phase_scan_coded(
                    codes_all, (integ, pe, ang), freq=freq, fs=cfg.if_fs,
                    norm_bandwidth=bw,
                    split_at=t_shards * s_blocks * n_if)
                start = t_idx * (s_blocks * n_if)
                phis_sh = lax.dynamic_slice_in_dim(phis, start, span,
                                                   axis=-1)
                new_prev_codes = codes_chunk[
                    ..., t_shards * s_blocks * n_if - halo_if:]

            # NCO synthesis — identical float ops to pll() (scale mult +
            # phase_adjust 0.0 add, same trig.nco_sincos kernel), so
            # samples match bit-for-bit
            from dy4tpu.ops import trig
            nco = trig.nco_sincos(
                phis_sh[..., 0, :] * f32(cfg.pll_nco_scale) + f32(0.0))[1]
            if rds_on:
                arg = (phis_sh[..., 1, :] * f32(cfg.rds_pll_nco_scale)
                       + f32(0.0))
                nco_q, nco_i = trig.nco_sincos(arg)
                # reference quirk: the stream's first quadrature NCO sample
                # is the init value 1.0 (fmMonoBlock.py:441)
                pos = (t_idx * s_blocks * n_if - halo_if
                       + jnp.arange(span, dtype=jnp.int32))
                nco_q = jnp.where((~started) & (pos == 0), f32(1.0), nco_q)
            else:
                nco_i = nco_q = None

            def split_mini(x):      # [C_l, span] -> mini [C_l, halo_if]
                return None if x is None else x[..., :halo_if]

            def to_blocks(x):       # real region -> [S, C_l, N]
                if x is None:
                    return None
                x = x[..., halo_if:]
                x = x.reshape((*x.shape[:-1], s_blocks, n_if))
                return jnp.moveaxis(x, -2, 0)

            # ---- stage 3: NCO-mixed back half, time-parallel ----
            # mini warm-up heals the audio/RDS resampler + RRC tails
            # (length-1 scan for the same bit-exactness reason as above)
            def bbody(st, inp):
                fo, nk, nik, nqk = inp
                st, bo = receiver.back_step(params, st, fo, nk, nik, nqk,
                                            cfg, precision=precision,
                                            rds_enabled=rds_on)
                return st, bo

            lead = lambda a: None if a is None else a[None]  # noqa: E731
            back_mini, _ = lax.scan(
                bbody, back,
                (jax.tree.map(lead, fo_mini,
                              is_leaf=lambda a: a is None),
                 lead(split_mini(nco)), lead(split_mini(nco_i)),
                 lead(split_mini(nco_q))))

            new_back, bos = lax.scan(
                bbody, back_mini,
                (fos, to_blocks(nco), to_blocks(nco_i), to_blocks(nco_q)))

            def flatten_blocks(x):                  # [S, C_l, n] -> [C_l, S*n]
                x = jnp.moveaxis(x, 0, -2)
                return x.reshape((*x.shape[:-2], -1))

            mono = flatten_blocks(bos.mono)
            leftch = flatten_blocks(bos.left)
            rightch = flatten_blocks(bos.right)
            if stereo:
                pcm = mixops.quantize_s16(mixops.interleave(leftch,
                                                            rightch))
            else:
                pcm = mixops.quantize_s16(mono)

            # ---- stage 4: global CDR, channel-parallel like the PLL ----
            if rds_on:
                bb = jnp.stack([bos.bb_i, bos.bb_q], axis=-2)

                def cbody(cst, bbk):
                    _si, _sq, symbols, resync, cst2 = receiver._cdr(
                        bbk[..., 0, :], bbk[..., 1, :], cst, cfg.rds_sps)
                    return cst2, (symbols, resync, cst2.offset)

                if chan_par:
                    bb_grp = lax.all_to_all(
                        pad_c4(bb, cp), TIME_AXIS, split_axis=1,
                        concat_axis=0, tiled=True)  # [T*S, cg, 2, M]
                    cdr_grp = jax.tree.map(
                        lambda a: lax.dynamic_slice_in_dim(
                            pad_c(a, 0), t_idx * cg, cg, axis=0), cdr)
                    new_cdr_g, (sym_all, res_all, off_all) = lax.scan(
                        cbody, cdr_grp, bb_grp)
                    new_cdr = jax.tree.map(
                        lambda a: lax.all_gather(a, TIME_AXIS, axis=0,
                                                 tiled=True)[:c_l],
                        new_cdr_g)

                    def redisperse(x):  # [T*S, cg, ...] -> [S, C_l, ...]
                        xs = jnp.stack(
                            [lax.dynamic_slice_in_dim(
                                x, j * s_blocks, s_blocks, axis=0)
                             for j in range(t_shards)], axis=0)
                        return lax.all_to_all(
                            xs, TIME_AXIS, split_axis=0, concat_axis=2,
                            tiled=True)[0][:, :c_l]
                    syms = flatten_blocks(redisperse(sym_all))
                    resync = jnp.moveaxis(redisperse(res_all), 0, -1)
                    offset = jnp.moveaxis(redisperse(off_all), 0, -1)
                else:
                    bb_all = (lax.all_gather(bb, TIME_AXIS, axis=0,
                                             tiled=True)
                              if t_shards > 1 else bb)  # [T*S, C_l, 2, M]
                    new_cdr, (sym_all, res_all, off_all) = lax.scan(
                        cbody, cdr, bb_all)
                    sl = lambda x: lax.dynamic_slice_in_dim(  # noqa: E731
                        x, t_idx * s_blocks, s_blocks, axis=0)
                    syms = flatten_blocks(sl(sym_all))
                    resync = jnp.moveaxis(sl(res_all), 0, -1)
                    offset = jnp.moveaxis(sl(off_all), 0, -1)
            else:
                new_cdr = cdr
                syms = resync = offset = None

            new_front = jax.tree.map(lambda a: a[None], new_front)
            new_back = jax.tree.map(lambda a: a[None], new_back)
            i2, p2, a2 = carry_mid
            return (new_front, new_back, i2, p2, a2, new_cdr,
                    new_prev_codes, jnp.ones((), bool),
                    ShardedOutputs(mono=mono, left=leftch, right=rightch,
                                   pcm=pcm, rds_symbols=syms,
                                   rds_resync=resync, rds_offset=offset))

        pllc_spec = P(CH_AXIS, None)
        if self.t_shards * self.ch_shards == 1:
            # single-device mesh: no collectives exist, and shard_map
            # itself measures +~8 ms/step at the serving point (the
            # 1x1-mesh A/B in benchmarks/micro_sharded.py) — run the
            # local body bare under jit; shapes coincide with the
            # global ones
            mapped = local
        else:
            mapped = shard_map(
                local, mesh=self.mesh,
                in_specs=(params_spec, front_spec, back_spec, pllc_spec,
                          pllc_spec, pllc_spec, cdr_spec,
                          P(CH_AXIS, None), P(CH_AXIS, None, None), P(),
                          P(CH_AXIS, TIME_AXIS)),
                out_specs=(front_spec, back_spec, pllc_spec, pllc_spec,
                           pllc_spec, cdr_spec, P(CH_AXIS, None, None),
                           P(), out_specs),
                check_vma=False,
            )

        def make_step(params):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def step_c(carry: ExactCarry, iq_u8):
                (nf, nb, i2, p2, a2, ncdr, npc, nstarted, outs) = mapped(
                    params, carry.front, carry.back, carry.pll_integ,
                    carry.pll_phase, carry.pll_angle, carry.cdr,
                    carry.prev_tail, carry.prev_codes, carry.started,
                    iq_u8)
                new_tail = iq_u8[..., -halo:]
                return ExactCarry(front=nf, back=nb, pll_integ=i2,
                                  pll_phase=p2, pll_angle=a2, cdr=ncdr,
                                  prev_tail=new_tail, prev_codes=npc,
                                  started=nstarted), outs
            return step_c

        return self._specialize(make_step)

    def _specialize(self, make_step):
        """Per-params compiled-step cache: the step CLOSES OVER the
        filter params so XLA constant-folds the banded-matrix
        construction (as a jit argument, the h[idx] gathers re-ran
        every step and their non-fusible products measured 3.5x the
        bytes-accessed of the identical-math closure form —
        benchmarks/micro_sharded.py round-5 bisect).  Params are fixed
        for a receiver's lifetime, so this compiles once per params
        pytree (the cache keeps a strong ref, so ids stay valid)."""
        cache: dict = {}

        def step(params, carry, iq_u8):
            ent = cache.get(id(params))
            if ent is None:
                ent = (params, make_step(params))
                cache[id(params)] = ent
            return ent[1](carry, iq_u8)

        return step
