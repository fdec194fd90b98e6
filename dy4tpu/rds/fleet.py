"""Fleet-scale RDS decoding: many channels on one host core.

The pure-Python ``FrameSynchronizer`` walks the synced bit stream at
~0.04 Mbit/s — fine for one station, ~34 stations at the 1187.5 b/s RDS
rate, and nowhere near the receiver's multi-hundred-channel DSP
throughput.  ``FleetDecoder`` keeps the Manchester layer vectorised in
numpy and pushes the frame-sync state machine into the native runtime
(``native/dy4_runtime.cpp`` FrameSync, >100 Mbit/s/core), giving
 >10k-station headroom per host core.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from dy4tpu.rds import coding
from dy4tpu.rds.decoder import Group, ManchesterDecoder
from dy4tpu.runtime import native


class FleetDecoder:
    """symbols -> groups for a batch of channels, native frame sync."""

    def __init__(self, channels: int,
                 on_group: Optional[Callable[[int, Group], None]] = None):
        if not native.available():
            raise RuntimeError("native runtime unavailable; use RDSDecoder")
        self.channels = channels
        self.on_group = on_group
        rows = coding.syndrome_matrix()
        self.manchester = [ManchesterDecoder() for _ in range(channels)]
        self.framers = [native.NativeFrameSync(rows, coding.OFFSET_WORDS)
                        for _ in range(channels)]
        self.groups: list[list[Group]] = [[] for _ in range(channels)]
        self._last_offset = [None] * channels

    def push_block(self, symbols: np.ndarray,
                   resync: Optional[np.ndarray] = None,
                   offsets: Optional[np.ndarray] = None) -> int:
        """``symbols``: [channels, n] hard symbols; ``resync``: [channels]
        bool; ``offsets``: [channels] CDR phases (see RDSDecoder.push_block
        — with offsets, reset happens only on an actual phase change).
        Returns the number of groups completed this block."""
        total = 0
        for c in range(self.channels):
            do_reset = bool(resync[c]) if resync is not None else False
            if offsets is not None:
                off = int(offsets[c])
                do_reset = (do_reset and self._last_offset[c] is not None
                            and off != self._last_offset[c])
                self._last_offset[c] = off
            if do_reset:
                self.manchester[c].reset()
                self.framers[c].reset()
            bits = self.manchester[c].push(symbols[c])
            if not len(bits):
                continue
            blocks, positions = self.framers[c].push(bits)
            for row, pos in zip(blocks, positions):
                g = Group(blocks={"A": int(row[0]), "B": int(row[1]),
                                  "C": int(row[2]), "D": int(row[3])},
                          bit_position=int(pos))
                self.groups[c].append(g)
                if self.on_group:
                    self.on_group(c, g)
                total += 1
        return total
