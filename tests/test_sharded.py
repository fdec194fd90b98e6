"""Time/channel-sharded receiver vs the sequential scan.

Correctness claims verified here (see dy4tpu/parallel/sharded.py):
  * exact mode (default) is **bit-exact** vs the sequential scan on every
    output — mono, left/right, RDS symbols, CDR offset/resync — across
    step() boundaries (prev_tail + sign-code + global PLL/CDR carries);
  * legacy mode (exact=False) converges to the sequential trajectory
    after the halo warm-up (PLL re-lock), the documented approximation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dy4tpu.config import get_mode
from dy4tpu.parallel import ShardedReceiver, make_mesh
from dy4tpu.pipeline import receiver
from dy4tpu.tx import fm

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def mode0_stream():
    cfg = get_mode(0)
    n_blocks = 8
    n_audio = n_blocks * cfg.audio_per_block
    left = fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.8)
    right = fm.tone(2400.0, cfg.audio_fs, n_audio, amp=0.8)
    iq = fm.synthesize(cfg, n_blocks, left=left, right=right)
    return cfg, n_blocks, iq


def _sequential(cfg, iq, n_blocks):
    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg)
    blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))
    _, outs = jax.jit(
        lambda s, b: receiver.run_blocks(params, s, b, cfg))(state, blocks)
    return outs


def test_sharded_matches_sequential(mode0_stream):
    cfg, n_blocks, iq = mode0_stream
    mesh = make_mesh(ch=2, time=4)
    rx = ShardedReceiver(cfg, mesh, shard_blocks=1, overlap_blocks=1)
    channels = 2
    params = receiver.make_params(cfg)
    carry = rx.init(channels)

    iq2 = np.broadcast_to(iq, (channels, len(iq))).copy()
    seq = _sequential(cfg, iq, n_blocks)
    seq_mono = np.asarray(seq.mono).ravel()
    seq_l = np.asarray(seq.left).ravel()

    outs = []
    for half in range(2):  # two step() calls of 4 blocks each
        chunk = iq2[:, half * rx.chunk_len:(half + 1) * rx.chunk_len]
        carry, out = rx.step(params, carry,
                             jax.device_put(jnp.asarray(chunk),
                                            rx.input_sharding()))
        outs.append(jax.tree.map(np.asarray, out))
    sh_mono = np.concatenate([o.mono for o in outs], axis=-1)
    sh_l = np.concatenate([o.left for o in outs], axis=-1)
    sh_r = np.concatenate([o.right for o in outs], axis=-1)
    assert sh_mono.shape == (channels, len(seq_mono))

    # exact mode: every output bit-equal to the sequential scan, every
    # shard, both channels, across the step() boundary
    for c in range(channels):
        np.testing.assert_array_equal(sh_mono[c], seq_mono)
        np.testing.assert_array_equal(sh_l[c], seq_l)
        np.testing.assert_array_equal(sh_r[c], np.asarray(seq.right).ravel())


def test_sharded_rds_symbols(mode0_stream):
    """RDS hard symbols, CDR offsets, and resync flags from the exact
    sharded pipeline EQUAL the sequential decode, from block 0, across a
    step() boundary (VERDICT r1 item 3: no 0.95 agreement bar)."""
    cfg, n_blocks, iq = mode0_stream
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 2000).astype(np.int8)
    n_audio = n_blocks * cfg.audio_per_block
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.6),
                       right=fm.tone(2400.0, cfg.audio_fs, n_audio, amp=0.6),
                       rds_bits=bits)
    mesh = make_mesh(ch=1, time=4)
    rx = ShardedReceiver(cfg, mesh, shard_blocks=1, overlap_blocks=1)
    params = receiver.make_params(cfg)
    carry = rx.init(1)
    outs = []
    for half in range(2):  # two step() calls: exercises all exact carries
        chunk = iq[None, half * rx.chunk_len:(half + 1) * rx.chunk_len]
        carry, out = rx.step(params, carry,
                             jax.device_put(jnp.asarray(chunk),
                                            rx.input_sharding()))
        outs.append(jax.tree.map(np.asarray, out))
    sh_syms = np.concatenate([o.rds_symbols for o in outs], -1)[0]
    sh_off = np.concatenate([o.rds_offset for o in outs], -1)[0]
    sh_res = np.concatenate([o.rds_resync for o in outs], -1)[0]

    seq = _sequential(cfg, iq, n_blocks)
    np.testing.assert_array_equal(sh_syms,
                                  np.asarray(seq.rds_symbols).ravel())
    np.testing.assert_array_equal(sh_off,
                                  np.asarray(seq.rds_offset).ravel())
    np.testing.assert_array_equal(sh_res,
                                  np.asarray(seq.rds_resync).ravel())


def test_sharded_legacy_converges(mode0_stream):
    """exact=False (cheaper, no gather): PLL re-locks in the warm-up, so
    the stereo path converges to (not equals) the sequential trajectory."""
    cfg, n_blocks, iq = mode0_stream
    mesh = make_mesh(ch=2, time=4)
    rx = ShardedReceiver(cfg, mesh, shard_blocks=1, overlap_blocks=1,
                         exact=False)
    channels = 2
    params = receiver.make_params(cfg)
    carry = rx.init(channels)
    iq2 = np.broadcast_to(iq, (channels, len(iq))).copy()
    seq = _sequential(cfg, iq, n_blocks)
    seq_mono = np.asarray(seq.mono).ravel()
    seq_l = np.asarray(seq.left).ravel()

    outs = []
    for half in range(2):
        chunk = iq2[:, half * rx.chunk_len:(half + 1) * rx.chunk_len]
        carry, out = rx.step(params, carry,
                             jax.device_put(jnp.asarray(chunk),
                                            rx.input_sharding()))
        outs.append(jax.tree.map(np.asarray, out))
    sh_mono = np.concatenate([o.mono for o in outs], axis=-1)
    sh_l = np.concatenate([o.left for o in outs], axis=-1)
    # mono (LTI) exact even in legacy mode; stereo within 10% RMS post-lock
    np.testing.assert_allclose(sh_mono[0], seq_mono, atol=2e-5)
    apb = cfg.audio_per_block
    a, b = sh_l[0][2 * apb:], seq_l[2 * apb:]
    err = np.sqrt(np.mean((a - b) ** 2))
    assert err < 0.1 * np.sqrt(np.mean(b ** 2)), err


def test_sharded_mode1_no_rds():
    """Non-RDS mode through the sharded receiver: the Optional RDS legs
    are None end-to-end and the mono path stays exact."""
    cfg = get_mode(1)
    n_blocks = 8
    n_audio = n_blocks * cfg.audio_per_block
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(700.0, cfg.audio_fs, n_audio, amp=0.7),
                       right=fm.tone(1700.0, cfg.audio_fs, n_audio, amp=0.7))

    mesh = make_mesh(ch=2, time=4)
    rx = ShardedReceiver(cfg, mesh, shard_blocks=2, overlap_blocks=1)
    params = receiver.make_params(cfg)
    carry = rx.init(2)
    iq2 = np.broadcast_to(iq, (2, len(iq))).copy()
    carry, out = rx.step(params, carry,
                         jax.device_put(jnp.asarray(iq2),
                                        rx.input_sharding()))
    assert out.rds_symbols is None and out.rds_resync is None
    assert out.pcm.shape == (2, 2 * n_blocks * cfg.audio_per_block)

    seq = _sequential(cfg, iq, n_blocks)
    np.testing.assert_allclose(np.asarray(out.mono)[0],
                               np.asarray(seq.mono).ravel(), atol=2e-5)


@pytest.mark.slow
def test_sharded_fleet_decode_integration():
    """Sharded DSP outputs drain through the native FleetDecoder.

    RDS runs at 1187.5 b/s (~38 bits per mode-0 block after the
    Manchester layer), so the stream must be long enough for the pairing
    vote plus a few groups.  The CDR offsets drift a few samples between
    time shards (each shard re-acquires in its warm-up; a clean signal
    has a wide eye so the hard symbols stay identical) — consumers of the
    sharded path reset on the ``resync`` flag, not on offset drift.
    """
    from dy4tpu.runtime import native
    if not native.available():
        pytest.skip("native runtime not built")
    from dy4tpu.rds import coding
    from dy4tpu.rds.fleet import FleetDecoder

    cfg = get_mode(0)
    n_blocks = 24
    bits = coding.make_ps_bitstream(0x7E57, 10, "SHARDFLT", repeats=80)
    n_audio = n_blocks * cfg.audio_per_block
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.6),
                       right=fm.tone(2400.0, cfg.audio_fs, n_audio, amp=0.6),
                       rds_bits=bits)
    mesh = make_mesh(ch=1, time=8)
    rx = ShardedReceiver(cfg, mesh, shard_blocks=3, overlap_blocks=1)
    params = receiver.make_params(cfg)
    carry = rx.init(1)
    carry, out = rx.step(params, carry,
                         jax.device_put(jnp.asarray(iq[None]),
                                        rx.input_sharding()))
    symbols = np.asarray(out.rds_symbols)       # [1, T*S*spb]
    resync = np.asarray(out.rds_resync)         # [1, T*S]
    spb = cfg.rds_symbols_per_block

    fleet = FleetDecoder(1)
    for b in range(n_blocks):
        fleet.push_block(symbols[:, b * spb:(b + 1) * spb],
                         resync[:, b])
    assert fleet.groups[0], "no groups decoded through sharded + fleet"
    assert fleet.groups[0][0].pi == 0x7E57


def test_sharded_channel_parallel_replay_exact(mode0_stream):
    """When local channels divide the time axis, the exact PLL/CDR replay
    re-shards over time BY CHANNEL (all_to_all) instead of replicating —
    the serial-fraction fix of VERDICT r2 item 4.  Outputs must stay
    bit-equal to the sequential scan for EVERY channel, including RDS
    symbols/offsets/resync and across a step() boundary."""
    cfg, n_blocks, _ = mode0_stream
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, 2000).astype(np.int8)
    n_audio = n_blocks * cfg.audio_per_block
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.6),
                       right=fm.tone(2400.0, cfg.audio_fs, n_audio, amp=0.6),
                       rds_bits=bits)
    mesh = make_mesh(ch=1, time=4)
    rx = ShardedReceiver(cfg, mesh, shard_blocks=1, overlap_blocks=1)
    channels = 8   # C_l = 8 divisible by T = 4 -> channel-parallel path
    params = receiver.make_params(cfg)
    carry = rx.init(channels)
    iq2 = np.broadcast_to(iq, (channels, len(iq))).copy()

    outs = []
    for half in range(2):
        chunk = iq2[:, half * rx.chunk_len:(half + 1) * rx.chunk_len]
        carry, out = rx.step(params, carry,
                             jax.device_put(jnp.asarray(chunk),
                                            rx.input_sharding()))
        outs.append(jax.tree.map(np.asarray, out))
    cat = lambda f: np.concatenate([getattr(o, f) for o in outs], -1)  # noqa: E731

    # batched sequential baseline: XLA accumulates float dots differently
    # per batch shape, so the bit-equality bar needs the SAME [C, ...]
    # batch on both sides (C_l=1 shards match the unbatched scan instead)
    state = receiver.init_state(cfg, batch=(channels,))
    blocks = jnp.broadcast_to(
        jnp.asarray(iq.reshape(n_blocks, cfg.block_size))[:, None, :],
        (n_blocks, channels, cfg.block_size))
    _, seq = jax.jit(
        lambda s, b: receiver.run_blocks(params, s, b, cfg))(state, blocks)

    def seq_stream(x):  # [B, C, n] -> [C, B*n]
        x = np.asarray(x)
        return np.moveaxis(x, 0, -2).reshape(channels, -1)

    np.testing.assert_array_equal(cat("mono"), seq_stream(seq.mono))
    np.testing.assert_array_equal(cat("left"), seq_stream(seq.left))
    np.testing.assert_array_equal(cat("rds_symbols"),
                                  seq_stream(seq.rds_symbols))
    np.testing.assert_array_equal(cat("rds_offset"),
                                  seq_stream(seq.rds_offset[..., None]))
    np.testing.assert_array_equal(cat("rds_resync"),
                                  seq_stream(seq.rds_resync[..., None]))


def test_sharded_subblock_halo_exact(mode0_stream):
    """Round-5 sub-block halo (VERDICT r4 item 3): the default
    overlap_blocks=None picks the minimal IF-aligned warm-up
    (exact_min_halo_if = 1/4 block for mode 0, vs the old whole-block
    halo) and every output must STILL be bit-equal to the sequential
    scan — states heal through the mini because each is a trailing
    stream-value window shallower than the mini."""
    from dy4tpu.parallel.sharded import exact_min_halo_if

    cfg, n_blocks, _ = mode0_stream
    assert exact_min_halo_if(cfg) * 4 == cfg.if_per_block  # 1/4 block
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 2000).astype(np.int8)
    n_audio = n_blocks * cfg.audio_per_block
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.6),
                       right=fm.tone(2400.0, cfg.audio_fs, n_audio,
                                     amp=0.6),
                       rds_bits=bits)
    mesh = make_mesh(ch=1, time=4)
    rx = ShardedReceiver(cfg, mesh, shard_blocks=1)   # overlap=None: auto
    assert rx.halo_if == cfg.if_per_block // 4
    params = receiver.make_params(cfg)
    carry = rx.init(1)
    outs = []
    for half in range(2):   # step boundary exercises the short carries
        chunk = iq[None, half * rx.chunk_len:(half + 1) * rx.chunk_len]
        carry, out = rx.step(params, carry,
                             jax.device_put(jnp.asarray(chunk),
                                            rx.input_sharding()))
        outs.append(jax.tree.map(np.asarray, out))
    seq = _sequential(cfg, iq, n_blocks)
    cat = lambda f: np.concatenate([getattr(o, f) for o in outs], -1)[0]  # noqa: E731
    np.testing.assert_array_equal(cat("mono"),
                                  np.asarray(seq.mono).ravel())
    np.testing.assert_array_equal(cat("left"),
                                  np.asarray(seq.left).ravel())
    np.testing.assert_array_equal(cat("rds_symbols"),
                                  np.asarray(seq.rds_symbols).ravel())
    np.testing.assert_array_equal(cat("rds_offset"),
                                  np.asarray(seq.rds_offset).ravel())
    np.testing.assert_array_equal(cat("rds_resync"),
                                  np.asarray(seq.rds_resync).ravel())


def test_sharded_chanpar_nondivisible_channels(mode0_stream):
    """Round-5: the channel-parallel replay no longer needs
    C_local % T == 0 — odd channel counts are padded with CODE_INVALID
    lanes (inert under the replay's freeze) and stay bit-exact."""
    cfg, n_blocks, _ = mode0_stream
    rng = np.random.default_rng(9)
    bits = rng.integers(0, 2, 2000).astype(np.int8)
    n_audio = n_blocks * cfg.audio_per_block
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.6),
                       right=fm.tone(2400.0, cfg.audio_fs, n_audio,
                                     amp=0.6),
                       rds_bits=bits)
    mesh = make_mesh(ch=1, time=4)
    rx = ShardedReceiver(cfg, mesh, shard_blocks=1, overlap_blocks=1)
    channels = 6   # 6 % 4 != 0 -> padded channel-parallel path
    params = receiver.make_params(cfg)
    carry = rx.init(channels)
    iq2 = np.broadcast_to(iq, (channels, len(iq))).copy()
    outs = []
    for half in range(2):
        chunk = iq2[:, half * rx.chunk_len:(half + 1) * rx.chunk_len]
        carry, out = rx.step(params, carry,
                             jax.device_put(jnp.asarray(chunk),
                                            rx.input_sharding()))
        outs.append(jax.tree.map(np.asarray, out))
    cat = lambda f: np.concatenate([getattr(o, f) for o in outs], -1)  # noqa: E731

    state = receiver.init_state(cfg, batch=(channels,))
    blocks = jnp.broadcast_to(
        jnp.asarray(iq.reshape(n_blocks, cfg.block_size))[:, None, :],
        (n_blocks, channels, cfg.block_size))
    _, seq = jax.jit(
        lambda s, b: receiver.run_blocks(params, s, b, cfg))(state, blocks)

    def seq_stream(x):
        x = np.asarray(x)
        return np.moveaxis(x, 0, -2).reshape(channels, -1)

    np.testing.assert_array_equal(cat("mono"), seq_stream(seq.mono))
    np.testing.assert_array_equal(cat("rds_symbols"),
                                  seq_stream(seq.rds_symbols))
    np.testing.assert_array_equal(cat("rds_offset"),
                                  seq_stream(seq.rds_offset[..., None]))


def test_sharded_single_device_mesh_exact(mode0_stream):
    """1x1 mesh: the exact step bypasses shard_map entirely (no
    collectives exist; shard_map alone measured +~8 ms/step on TPU) and
    must stay bit-equal to the sequential scan."""
    cfg, n_blocks, _ = mode0_stream
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, 2000).astype(np.int8)
    n_audio = n_blocks * cfg.audio_per_block
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.6),
                       right=fm.tone(2400.0, cfg.audio_fs, n_audio,
                                     amp=0.6),
                       rds_bits=bits)
    mesh = make_mesh(ch=1, time=1)
    rx = ShardedReceiver(cfg, mesh, shard_blocks=4)
    params = receiver.make_params(cfg)
    carry = rx.init(1)
    outs = []
    for half in range(2):
        chunk = iq[None, half * rx.chunk_len:(half + 1) * rx.chunk_len]
        carry, out = rx.step(params, carry, jnp.asarray(chunk))
        outs.append(jax.tree.map(np.asarray, out))
    seq = _sequential(cfg, iq, n_blocks)
    cat = lambda f: np.concatenate([getattr(o, f) for o in outs], -1)[0]  # noqa: E731
    np.testing.assert_array_equal(cat("mono"),
                                  np.asarray(seq.mono).ravel())
    np.testing.assert_array_equal(cat("rds_symbols"),
                                  np.asarray(seq.rds_symbols).ravel())


@pytest.mark.slow
def test_sharded_mode2_rational_exact():
    """Mode 2 through the exact sharded receiver: the rational
    (U=147/800) audio + 171/640 RDS back ends, SPS=27 CDR and the
    1/3-block auto halo all ride the sub-block warm-up and stay
    bit-equal to the sequential scan."""
    cfg = get_mode(2)
    from dy4tpu.parallel.sharded import exact_min_halo_if
    assert 3 * exact_min_halo_if(cfg) == cfg.if_per_block  # 1/3 block
    n_blocks = 8
    rng = np.random.default_rng(13)
    bits = rng.integers(0, 2, 2000).astype(np.int8)
    n_audio = n_blocks * cfg.audio_per_block
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.6),
                       right=fm.tone(2400.0, cfg.audio_fs, n_audio,
                                     amp=0.6),
                       rds_bits=bits)
    mesh = make_mesh(ch=1, time=4)
    rx = ShardedReceiver(cfg, mesh, shard_blocks=1)
    params = receiver.make_params(cfg)
    carry = rx.init(1)
    outs = []
    for half in range(2):
        chunk = iq[None, half * rx.chunk_len:(half + 1) * rx.chunk_len]
        carry, out = rx.step(params, carry,
                             jax.device_put(jnp.asarray(chunk),
                                            rx.input_sharding()))
        outs.append(jax.tree.map(np.asarray, out))
    seq = _sequential(cfg, iq, n_blocks)
    cat = lambda f: np.concatenate([getattr(o, f) for o in outs], -1)[0]  # noqa: E731
    np.testing.assert_array_equal(cat("mono"),
                                  np.asarray(seq.mono).ravel())
    np.testing.assert_array_equal(cat("left"),
                                  np.asarray(seq.left).ravel())
    np.testing.assert_array_equal(cat("rds_symbols"),
                                  np.asarray(seq.rds_symbols).ravel())
    np.testing.assert_array_equal(cat("rds_resync"),
                                  np.asarray(seq.rds_resync).ravel())
