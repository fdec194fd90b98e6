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
import os
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


def _launch_env_present() -> bool:
    """True when the launcher/TPU metadata can supply the distributed
    arguments (Cloud TPU pod slice, SLURM/OpenMPI, or an explicit
    coordinator in the environment).

    SLURM/OpenMPI are gated on vars that actually imply *multiple*
    processes (an ordinary single-node batch job sets SLURM_JOB_ID but
    must not trigger a coordinator-less distributed bring-up).
    """
    env = os.environ
    if any(k in env for k in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
            "TPU_WORKER_ID", "CLOUD_TPU_TASK_ID")):
        return True
    # Only a *multi*-host worker list implies a distributed launch (a
    # single-chip dev tunnel sets TPU_WORKER_HOSTNAMES=localhost).
    if len([h for h in env.get("TPU_WORKER_HOSTNAMES", "").split(",")
            if h.strip()]) > 1:
        return True
    for k in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(env.get(k, "1")) > 1:
                return True
        except ValueError:
            pass
    return False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> HostTopology:
    """Bring up jax.distributed (no-op on a plain single host) and report
    the topology.

    Arguments left ``None`` default to the TPU metadata / env-provided
    values, mirroring ``jax.distributed.initialize`` semantics: on a real
    pod slice calling ``initialize()`` with no arguments must still bring
    up DCN (the launcher supplies coordinator/process info), so we call it
    whenever either the caller passes multi-process arguments or the
    launch environment advertises them — not only on explicit
    ``num_processes > 1``.
    """
    explicit_single = num_processes is not None and num_processes <= 1
    want = not explicit_single and (
        (num_processes is not None and num_processes > 1)
        or coordinator_address is not None
        or _launch_env_present())
    if want:
        already = jax.distributed.is_initialized()
        if not already:
            try:
                jax.distributed.initialize(
                    coordinator_address=coordinator_address,
                    num_processes=num_processes,
                    process_id=process_id)
            except RuntimeError as e:
                # Only the double-initialization race is benign; a real
                # coordinator bring-up failure (unreachable address,
                # timeout, process-count mismatch) must fail loudly —
                # silently degrading to single-process topology would do
                # duplicated per-host work on a pod (ADVICE r2).
                if "already initialized" not in str(e).lower():
                    raise
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
