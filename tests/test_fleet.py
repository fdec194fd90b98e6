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
