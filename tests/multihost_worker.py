"""Worker process for the 2-process multi-host integration test.

Run as ``python tests/multihost_worker.py <pid> <nprocs> <port>``; each
process pins the CPU backend with 2 local devices, joins the
``jax.distributed`` cluster over a localhost coordinator (collectives
ride Gloo — the same DCN code path a real N-host pod uses), builds the
production ``pod_mesh`` (channel axis across hosts, time axis on local
devices), and streams the exact time-sharded receiver over it.  Each
process then checks ONLY its addressable output shards bit-for-bit
against a locally computed sequential decode — the strongest placement
check available without any output gather.

Replaces what the reference wires with UNIX pipes on one host
(constraints pdf p.2) at pod scale; see dy4tpu/parallel/multihost.py.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import numpy as np
    import jax.numpy as jnp

    from dy4tpu.config import get_mode
    from dy4tpu.parallel import ShardedReceiver, multihost
    from dy4tpu.pipeline import receiver
    from dy4tpu.tx import fm

    topo = multihost.initialize(coordinator_address=f"localhost:{port}",
                                num_processes=nprocs, process_id=pid)
    assert topo.num_processes == nprocs, topo
    assert len(jax.devices()) == 2 * nprocs

    mesh = multihost.pod_mesh(time_per_host=2)  # ch spans hosts
    cfg = get_mode(0)
    channels = nprocs  # one channel per host (ch axis == host axis)
    assert multihost.local_channel_slice(channels) == slice(pid, pid + 1)

    n_blocks = 4
    n_audio = n_blocks * cfg.audio_per_block
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.8),
                       right=fm.tone(2400.0, cfg.audio_fs, n_audio, amp=0.8))

    rx = ShardedReceiver(cfg, mesh, shard_blocks=1, overlap_blocks=1)
    params = receiver.make_params(cfg)
    carry = rx.init(channels)

    # sequential oracle, computed independently in every process
    state = receiver.init_state(cfg)
    blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))
    _, seq = jax.jit(lambda s, b: receiver.run_blocks(
        params, s, b, cfg))(state, blocks)
    seq_mono = np.asarray(seq.mono).ravel()
    seq_l = np.asarray(seq.left).ravel()
    seq_syms = np.asarray(seq.rds_symbols).ravel()

    iq2 = np.broadcast_to(iq, (channels, len(iq)))
    spec = rx.input_sharding()
    for half in range(2):  # two step() calls: exercises all exact carries
        chunk = iq2[:, half * rx.chunk_len:(half + 1) * rx.chunk_len]
        garr = jax.make_array_from_process_local_data(
            spec, np.ascontiguousarray(chunk[pid:pid + 1]))
        carry, out = rx.step(params, carry, garr)
        # check ONLY this process's addressable shards against the oracle
        t0 = half * rx.chunk_len // cfg.block_size
        for name, garr_out, ref in (("mono", out.mono, seq_mono),
                                    ("left", out.left, seq_l),
                                    ("rds", out.rds_symbols, seq_syms)):
            n_per_step = garr_out.shape[-1]
            per_blk = n_per_step // (rx.t_shards * rx.shard_blocks)
            ref_step = ref[t0 * per_blk:(t0 + rx.t_shards) * per_blk]
            shards = garr_out.addressable_shards
            assert shards, name
            for s in shards:
                ch_sl, t_sl = s.index
                assert ch_sl == slice(pid, pid + 1), (name, s.index)
                np.testing.assert_array_equal(
                    np.asarray(s.data)[0], ref_step[t_sl],
                    err_msg=f"{name} shard {s.index} step {half}")
    print(f"MULTIHOST-OK pid={pid} devices={len(jax.devices())}",
          flush=True)


if __name__ == "__main__":
    main()
