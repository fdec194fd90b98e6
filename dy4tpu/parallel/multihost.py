"""Multi-host deployment helpers.

The reference is a single process wired by UNIX pipes (constraints pdf
p.2).  At pod-slice scale the equivalent is one process per host, each
ingesting its own subset of IQ channels, joined by ``jax.distributed``:
intra-slice collectives (the time-axis halo ``ppermute``) ride ICI, and
the channel axis is laid out so no cross-host traffic is needed for the
embarrassingly parallel dimension.

This module cannot be integration-tested in a single-host image; it is
exercised by construction (pure argument plumbing around
``jax.distributed.initialize`` + mesh building) and documented for the
N-host benchmark protocol in BASELINE.md.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

from dy4tpu.parallel.mesh import CH_AXIS, TIME_AXIS


@dataclasses.dataclass
class HostTopology:
    """This process's slot in the multi-host launch."""
    process_id: int
    num_processes: int
    local_devices: Sequence[jax.Device]

    @property
    def is_coordinator(self) -> bool:
        return self.process_id == 0


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> HostTopology:
    """Bring up jax.distributed (no-op on a single host) and report the
    topology.  Arguments default to the TPU metadata / env-provided
    values, mirroring ``jax.distributed.initialize`` semantics."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return HostTopology(process_id=jax.process_index(),
                        num_processes=jax.process_count(),
                        local_devices=jax.local_devices())


def pod_mesh(time_per_host: int = 1) -> Mesh:
    """Global (ch, time) mesh over all hosts' devices.

    The time axis is kept *within* a host's devices (halo ppermute stays
    on intra-host ICI); the channel axis spans hosts (no communication).
    Device order: jax.devices() is grouped by process, so rows = hosts x
    local chunks, columns = time.
    """
    devs = jax.devices()
    n = len(devs)
    if n % time_per_host:
        raise ValueError(f"{n} devices not divisible by time={time_per_host}")
    grid = np.array(devs).reshape(n // time_per_host, time_per_host)
    return Mesh(grid, (CH_AXIS, TIME_AXIS))


def local_channel_slice(total_channels: int) -> slice:
    """Which channels this host ingests (contiguous block per process,
    matching the pod_mesh channel-axis layout)."""
    per = total_channels // jax.process_count()
    if per * jax.process_count() != total_channels:
        raise ValueError(f"{total_channels} channels not divisible by "
                         f"{jax.process_count()} processes")
    start = jax.process_index() * per
    return slice(start, start + per)
