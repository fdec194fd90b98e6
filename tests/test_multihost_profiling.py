"""Single-host coverage for multihost plumbing + profiling helpers."""

import numpy as np
import pytest

import jax

from dy4tpu.parallel import multihost
from dy4tpu.parallel.mesh import CH_AXIS, TIME_AXIS
from dy4tpu.utils.profiling import StageTimer, Throughput


def test_initialize_single_host(monkeypatch):
    for k in ("SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
              "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    topo = multihost.initialize()
    assert topo.num_processes == 1 and topo.is_coordinator
    assert len(topo.local_devices) == len(jax.local_devices())


def test_initialize_defaults_to_launcher_env(monkeypatch):
    """With no explicit arguments but a launcher-provided environment,
    jax.distributed.initialize() must still be called (the real-pod
    default-metadata contract); an explicit num_processes=1 must not."""
    calls = []

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls.append((coordinator_address, num_processes, process_id))

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    multihost.initialize()
    assert calls == [(None, None, None)]

    calls.clear()
    multihost.initialize(num_processes=1)  # explicit single: no-op
    assert calls == []

    calls.clear()
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
    multihost.initialize(coordinator_address="10.0.0.2:8476",
                         num_processes=4, process_id=2)
    assert calls == [("10.0.0.2:8476", 4, 2)]


def test_initialize_single_node_batch_job_is_noop(monkeypatch):
    """An ordinary single-node SLURM/MPI job (job id present, one task)
    must NOT trigger a coordinator-less distributed bring-up, and a
    single-hostname TPU_WORKER_HOSTNAMES (dev tunnel) must not either
    (ADVICE r2)."""
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setenv("SLURM_JOB_ID", "12345")
    monkeypatch.setenv("SLURM_NTASKS", "1")
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    multihost.initialize()
    assert calls == []

    monkeypatch.setenv("SLURM_NTASKS", "4")  # real multi-task launch
    multihost.initialize()
    assert len(calls) == 1

    calls.clear()
    monkeypatch.setenv("SLURM_NTASKS", "1")
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    multihost.initialize()
    assert len(calls) == 1


def test_initialize_reraises_real_bringup_failure(monkeypatch):
    """A genuine coordinator failure must fail loudly — only the
    double-initialization race is benign (ADVICE r2: silently degrading
    to single-process would duplicate per-host work on a pod)."""
    def boom(**kw):
        raise RuntimeError("connection to coordinator timed out")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    with pytest.raises(RuntimeError, match="timed out"):
        multihost.initialize(coordinator_address="10.0.0.9:1",
                             num_processes=2, process_id=0)

    def already(**kw):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", already)
    topo = multihost.initialize(coordinator_address="10.0.0.9:1",
                                num_processes=2, process_id=0)
    assert topo.num_processes == 1  # benign re-entry falls through


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pod_mesh_layout():
    mesh = multihost.pod_mesh(time_per_host=4)
    assert mesh.shape == {CH_AXIS: 2, TIME_AXIS: 4}
    with pytest.raises(ValueError):
        multihost.pod_mesh(time_per_host=3)


def test_local_channel_slice():
    # single process: every channel is local
    assert multihost.local_channel_slice(12) == slice(0, 12)


def test_stage_timer_reports():
    t = StageTimer()
    x = t.time_fn("mul", lambda: jax.numpy.ones(8) * 2)
    np.testing.assert_array_equal(np.asarray(x), 2.0)
    with t.stage("block", result=x):
        pass
    rep = t.report()
    assert "mul" in rep and "block" in rep


def test_throughput_meter():
    m = Throughput(rf_fs=2.4e6)
    m.update(0)
    rate = m.update(240000)
    assert rate > 0
    assert m.x_realtime == rate / 2.4e6
