"""Native frame synchronizer parity + fleet decoder.

The native FrameSync must reproduce the Python FrameSynchronizer's group
stream EXACTLY — same blocks, same bit positions — including acquisition
on a misaligned preamble, bit-error-induced misses and re-acquisition.
"""

import numpy as np
import pytest

from dy4tpu.rds import coding
from dy4tpu.rds.decoder import FrameSynchronizer
from dy4tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


def _noisy_stream(seed=0, repeats=120, flips=40):
    rng = np.random.default_rng(seed)
    bits = np.array(coding.make_ps_bitstream(0xBEEF, 10, "TESTING!",
                                             repeats=repeats), np.int8)
    noisy = bits.copy()
    idx = rng.choice(len(noisy), flips, replace=False)
    noisy[idx] ^= 1
    return np.concatenate([rng.integers(0, 2, 37).astype(np.int8), noisy,
                           rng.integers(0, 2, 300).astype(np.int8),
                           bits[:2000]])


@pytest.mark.parametrize("chunk", [997, 26, 100000])
def test_native_framesync_matches_python(chunk):
    stream = _noisy_stream()
    fs = FrameSynchronizer()
    py = []
    for i in range(0, len(stream), chunk):
        py.extend(fs.push(stream[i:i + chunk]))

    nfs = native.NativeFrameSync(coding.syndrome_matrix(),
                                 coding.OFFSET_WORDS)
    nat = []
    for i in range(0, len(stream), chunk):
        b, p = nfs.push(stream[i:i + chunk].astype(np.uint8))
        nat.extend(zip(b.tolist(), p.tolist()))

    assert len(py) == len(nat) and len(py) > 50
    for g, (row, pos) in zip(py, nat):
        assert [g.blocks.get(k, 0) for k in "ABCD"] == row
        assert g.bit_position == pos


def test_native_framesync_throughput_floor():
    """>100x the Python layer (which does ~0.04 Mbit/s)."""
    import time
    bits = np.tile(np.array(coding.make_ps_bitstream(
        0x1234, 5, "SPEEDTST", repeats=500), np.uint8), 4)
    nfs = native.NativeFrameSync(coding.syndrome_matrix(),
                                 coding.OFFSET_WORDS)
    t0 = time.perf_counter()
    nfs.push(bits)
    rate = len(bits) / (time.perf_counter() - t0)
    assert rate > 4e6, rate  # conservative floor even on loaded CI


def _station_symbols(pi, ps, repeats=30):
    bits = coding.make_ps_bitstream(pi, 10, ps, repeats=repeats)
    halves = coding.manchester_halves(coding.differential_encode(bits))
    return ((halves + 1) // 2).astype(np.int8)


@pytest.mark.parametrize("spb", [76, 95])  # mode-0 even, mode-2 odd
def test_batch_manchester_matches_scalar(spb):
    """BatchManchester == per-channel ManchesterDecoder bit-for-bit,
    including per-channel resets at different blocks and odd
    symbols-per-block (mode 2)."""
    from dy4tpu.rds.decoder import ManchesterDecoder
    from dy4tpu.rds.fleet import BatchManchester

    rng = np.random.default_rng(3)
    c, n_blocks = 5, 24
    sym = rng.integers(0, 2, (c, n_blocks * spb)).astype(np.int8)
    resets = {1: 7, 3: 13}          # channel -> block index of reset

    batch = BatchManchester(c)
    scalars = [ManchesterDecoder() for _ in range(c)]
    for b in range(n_blocks):
        blk = sym[:, b * spb:(b + 1) * spb]
        mask = np.zeros(c, bool)
        for ch, rb in resets.items():
            if rb == b:
                mask[ch] = True
                scalars[ch].reset()
        if mask.any():
            batch.reset(mask)
        bits, lens = batch.push(blk)
        for ch in range(c):
            ref = scalars[ch].push(blk[ch])
            assert lens[ch] == len(ref), (b, ch)
            np.testing.assert_array_equal(bits[ch, :lens[ch]],
                                          ref.astype(np.uint8))


def test_fleet_matches_rdsdecoder_groups():
    """FleetDecoder group stream == per-channel RDSDecoder."""
    from dy4tpu.rds.decoder import RDSDecoder
    from dy4tpu.rds.fleet import FleetDecoder

    streams = [_station_symbols(0xAB12, "FLEET PAR"[:8]),
               _station_symbols(0xCD34, "CHANNEL2")]
    n = min(len(s) for s in streams)
    sym = np.stack([s[:n] for s in streams])
    fleet = FleetDecoder(2)
    refs = [RDSDecoder(), RDSDecoder()]
    step = 76
    for i in range(0, n - step, step):
        blk = sym[:, i:i + step]
        fleet.push_block(blk)
        for ch in range(2):
            refs[ch].push_block(blk[ch])
    for ch in range(2):
        assert len(fleet.groups[ch]) == len(refs[ch].groups) > 10
        for a, b in zip(fleet.groups[ch], refs[ch].groups):
            assert a.blocks == b.blocks and a.bit_position == b.bit_position


def test_fleet_checkpoint_roundtrip():
    """state()/load_state() resumes mid-stream with an identical
    continuation (manchester numpy state + native framesync blob)."""
    from dy4tpu.rds.fleet import FleetDecoder

    sym = np.stack([_station_symbols(0x7E57, "CKPTFLT "),
                    _station_symbols(0x1357, "SECOND  ")])
    n = sym.shape[1]
    step = 76
    starts = list(range(0, n - step, step))
    cut = len(starts) // 2

    full = FleetDecoder(2)
    for i in starts:
        full.push_block(sym[:, i:i + step])

    first = FleetDecoder(2)
    for i in starts[:cut]:
        first.push_block(sym[:, i:i + step])
    blob = first.state()

    resumed = FleetDecoder(2)
    resumed.load_state(blob)
    for i in starts[cut:]:
        resumed.push_block(sym[:, i:i + step])

    for ch in range(2):
        tail = resumed.groups[ch]
        want = full.groups[ch][len(first.groups[ch]):]
        assert len(tail) == len(want) > 5
        for a, b in zip(tail, want):
            assert a.blocks == b.blocks and a.bit_position == b.bit_position


def test_fleet_decoder_multi_channel():
    from dy4tpu.rds.fleet import FleetDecoder

    stations = [(0x1111, "ALPHA FM"), (0x2222, "BRAVO FM")]
    streams = []
    for pi, ps in stations:
        bits = coding.make_ps_bitstream(pi, 10, ps, repeats=30)
        halves = coding.manchester_halves(coding.differential_encode(bits))
        symbols = ((halves + 1) // 2).astype(np.int8)  # ±1 -> {0,1}
        streams.append(symbols)
    n = min(len(s) for s in streams)
    sym = np.stack([s[:n] for s in streams])

    seen = {}
    fleet = FleetDecoder(2, on_group=lambda c, g: seen.setdefault(c, g))
    step = 1486
    for i in range(0, n - step, step):
        fleet.push_block(sym[:, i:i + step])
    for c, (pi, _) in enumerate(stations):
        assert fleet.groups[c], f"channel {c} decoded nothing"
        assert fleet.groups[c][0].pi == pi


def test_fleet_corrupt_checkpoint_rejected():
    """A corrupt framesync blob (oversized buf_len) must be rejected
    without mutating any channel state (ADVICE r2: native import_state
    previously trusted the serialized length -> OOB stack read)."""
    import pytest
    from dy4tpu.rds.fleet import FleetDecoder

    sym = np.stack([_station_symbols(0x7E57, "CKPTFLT "),
                    _station_symbols(0x1357, "SECOND  ")])
    dec = FleetDecoder(2)
    step = 76
    n = sym.shape[1]
    starts = list(range(0, n - step, step))
    cut = len(starts) // 2
    for i in starts[:cut]:
        dec.push_block(sym[:, i:i + step])

    good = dec.framer.export_state()
    bad = b"\xff" * len(good)  # buf_len = 0xFFFF > kMaxBuf in every record
    with pytest.raises(ValueError, match="rejected"):
        dec.framer.import_state(bad)
    with pytest.raises(ValueError, match="blob"):
        dec.framer.import_state(good[:-1])  # wrong size

    # rejection left the batch untouched: the stream continues exactly
    ref = FleetDecoder(2)
    ref.framer.import_state(good)
    ref.manchester.load_state(dec.manchester.state())
    ref._last_offset[...] = dec._last_offset
    for i in starts[cut:]:
        dec.push_block(sym[:, i:i + step])
        ref.push_block(sym[:, i:i + step])
    for ch in range(2):
        assert len(dec.groups[ch]) > 5
        got = [(g.blocks, g.bit_position) for g in ref.groups[ch]]
        want = [(g.blocks, g.bit_position)
                for g in dec.groups[ch][len(dec.groups[ch]) - len(got):]]
        assert got == want
