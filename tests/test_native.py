"""Native host runtime: SPSC ring, source/sink threads over real pipes.

Covers the reference's threadSafeQ semantics (src/threadSafeQ.cpp:18-55)
and the stdin block-reader contract — short trailing reads are dropped
(iofunc.cpp:113-120, project.cpp:293-296).
"""

import os
import threading
import time

import numpy as np
import pytest

from dy4tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


def test_ring_roundtrip_and_wrap():
    r = native.Ring(256)  # rounds up to a power of two
    data = np.arange(1000, dtype=np.int64).astype(np.uint8)
    written = 0
    read = []
    while written < len(data) or r.readable():
        if written < len(data):
            written += r.push(data[written:written + 100])
        got = r.pop(64)
        if len(got):
            read.append(got)
    np.testing.assert_array_equal(np.concatenate(read), data)


def test_ring_blocking_dequeue():
    """Consumer blocks until the producer delivers (threadSafeQ.cpp:34-47)."""
    r = native.Ring(1024)
    payload = np.arange(128, dtype=np.uint8)

    def produce():
        r.push(payload)

    t = threading.Timer(0.05, produce)
    t.start()
    n = r.wait_readable(128, timeout_ms=5000)
    t.join()
    assert n >= 128
    np.testing.assert_array_equal(r.pop(128), payload)


def test_source_blocks_and_eof():
    rd, wr = os.pipe()
    src = native.NativeSource(rd, block_bytes=100, capacity_blocks=4)
    os.write(wr, bytes([i % 256 for i in range(250)]))
    os.close(wr)
    b1 = src.next_block()
    b2 = src.next_block()
    b3 = src.next_block(timeout_ms=5000)  # partial 50-byte tail -> EOF
    src.close()
    os.close(rd)
    np.testing.assert_array_equal(
        b1, np.array([i % 256 for i in range(100)], np.uint8))
    np.testing.assert_array_equal(
        b2, np.array([i % 256 for i in range(100, 200)], np.uint8))
    assert b3 is None


def test_sink_broken_pipe_wakes_blocked_push():
    """Downstream death must surface as BrokenPipeError, not a hang.

    Regression: with the reader end closed and the ring full, a push with
    timeout_ms=-1 used to block forever in wait_writable because the
    writer thread recorded the error without closing/notifying the ring.
    """
    rd, wr = os.pipe()
    snk = native.NativeSink(wr, capacity_bytes=4096)
    os.close(rd)  # downstream (e.g. aplay) is gone
    payload = np.zeros(1 << 16, np.uint8)  # >> pipe buffer + ring capacity
    t0 = time.monotonic()
    with pytest.raises(BrokenPipeError):
        for _ in range(64):
            snk.push(payload, timeout_ms=-1)
    assert time.monotonic() - t0 < 10.0  # promptly, not via an outer timeout
    snk.close()
    os.close(wr)


def test_source_close_with_idle_pipe_does_not_hang():
    """~Source must join even while the reader is parked on an idle pipe
    that never delivers data or EOF (the ADVICE poll-loop fix)."""
    rd, wr = os.pipe()  # keep wr open: no data, no EOF
    src = native.NativeSource(rd, block_bytes=64, capacity_blocks=4)
    with pytest.raises(TimeoutError):
        src.next_block(timeout_ms=50)
    t0 = time.monotonic()
    src.close()
    assert time.monotonic() - t0 < 2.0
    os.close(wr)
    os.close(rd)


def test_sink_writes_through():
    rd, wr = os.pipe()
    snk = native.NativeSink(wr, 1 << 16)
    payload = np.arange(1000, dtype=np.int16)
    snk.push(payload)
    snk.flush()
    got = os.read(rd, 4000)
    snk.close()
    os.close(wr)
    os.close(rd)
    np.testing.assert_array_equal(np.frombuffer(got, np.int16), payload)


def test_native_framesync_burst_correction_matches_python():
    """Native burst correction == Python FrameSynchronizer on a stream
    with correctable and uncorrectable errors; OFF reproduces drops."""
    from dy4tpu.rds import coding
    from dy4tpu.rds.decoder import FrameSynchronizer
    from dy4tpu.runtime.native import NativeFrameSync

    bits = np.array(coding.make_ps_bitstream(0x54A7, 10, "DY4TPU  ",
                                             repeats=4), np.int8)
    corrupt = bits.copy()
    corrupt[3 * 104 + 26 + 5:3 * 104 + 26 + 10] ^= np.array(
        [1, 1, 0, 0, 1], np.int8)                  # 5-burst in a B block
    corrupt[10 * 104 + 2] ^= 1                     # 1-bit in an A block

    py = FrameSynchronizer()
    py_groups = [(g.blocks["A"], g.blocks["B"], g.blocks["C"],
                  g.blocks["D"], g.bit_position)
                 for g in py.push(corrupt)]

    nat = NativeFrameSync(coding.syndrome_matrix(), coding.OFFSET_WORDS)
    blocks, pos = nat.push(corrupt.astype(np.uint8))
    nat_groups = [(int(b[0]), int(b[1]), int(b[2]), int(b[3]), int(p))
                  for b, p in zip(blocks, pos)]
    assert nat_groups == py_groups
    assert nat.corrected == py.corrected == 2

    nat_off = NativeFrameSync(coding.syndrome_matrix(),
                              coding.OFFSET_WORDS)
    nat_off.set_correct(False)
    blocks_off, _ = nat_off.push(corrupt.astype(np.uint8))
    assert nat_off.corrected == 0
    assert len(blocks_off) < len(blocks)
