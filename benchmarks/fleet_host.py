"""Fleet host-layer throughput: can one core's decode keep up with the
device DSP at >=1024 channels?

Each mode-0 channel produces 76 symbols per 32 ms block (2375 sym/s).
The device DSP sustains ~1800 channels real-time per chip (bench.py), so
the host layers must decode >=1024 channels in well under 32 ms per
block.  Measures BatchManchester + native FrameSyncBatch end to end.

Run: python benchmarks/fleet_host.py   (pure host, no TPU needed)
Env: FLEET_CHANNELS (default 1024), FLEET_BLOCKS (default 64).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from dy4tpu.rds import coding
from dy4tpu.rds.fleet import FleetDecoder


def main() -> None:
    channels = int(os.environ.get("FLEET_CHANNELS", 1024))
    n_blocks = int(os.environ.get("FLEET_BLOCKS", 64))
    spb = 76                 # mode-0 symbols per 32 ms block
    block_ms = 32.0

    # one real station stream, shifted per channel so every channel
    # carries decodable (but differently-aligned) data
    bits = coding.make_ps_bitstream(0x5AFE, 10, "FLEETBNC",
                                    repeats=n_blocks)
    halves = coding.manchester_halves(coding.differential_encode(bits))
    base = ((halves + 1) // 2).astype(np.int8)
    need = n_blocks * spb + channels
    reps = -(-need // len(base))
    base = np.tile(base, reps)
    sym = np.stack([base[c % 97:c % 97 + n_blocks * spb]
                    for c in range(channels)])

    fleet = FleetDecoder(channels, collect=False)
    # warm-up one block (numpy allocation paths)
    fleet.push_block(sym[:, :spb])

    t0 = time.perf_counter()
    groups = 0
    for b in range(1, n_blocks):
        groups += fleet.push_block(sym[:, b * spb:(b + 1) * spb])
    dt = time.perf_counter() - t0

    per_block_ms = dt / (n_blocks - 1) * 1e3
    rt = block_ms / per_block_ms
    synced = int(fleet.framer.synced.sum())
    print(f"channels={channels} blocks={n_blocks - 1} "
          f"groups={groups} synced={synced}/{channels}")
    print(f"host decode: {per_block_ms:.2f} ms per {block_ms:.0f} ms "
          f"block batch = {rt:.1f}x real-time at C={channels} "
          f"({rt * channels:.0f} single-channel real-time equivalents)")
    assert synced > channels * 0.9, "fleet failed to sync"
    assert rt > 1.0, f"host layer cannot keep up: {per_block_ms:.2f} ms/block"


if __name__ == "__main__":
    main()
