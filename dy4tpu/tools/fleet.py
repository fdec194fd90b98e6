"""Fleet serving CLI: decode MANY stations through one batched receiver.

The production shape of the framework: N capture files (or N repeats of
one) become an [N, block] channel batch; the whole mono+stereo+RDS DSP
runs as one jitted scan per block row, and the RDS bit/frame layers
drain through the native FleetDecoder.  Per-station PI/PS/radiotext and
aggregate throughput print at the end.

    python -m dy4tpu.tools.fleet --mode 0 captures/*.raw
    python -m dy4tpu.tools.fleet --mode 0 --repeat 64 one_capture.raw
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="batched multi-station receiver + RDS fleet decode")
    p.add_argument("captures", nargs="+", help="u8 IQ capture files")
    p.add_argument("--mode", type=int, default=0, choices=[0, 2],
                   help="RDS-capable mode")
    p.add_argument("--repeat", type=int, default=1,
                   help="tile the capture list this many times")
    p.add_argument("--max-blocks", type=int, default=None)
    args = p.parse_args(argv)

    from dy4tpu.utils import jaxenv
    jaxenv.setup()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from dy4tpu.config import get_mode
    from dy4tpu.pipeline import receiver
    from dy4tpu.rds.app import ApplicationLayer
    from dy4tpu.rds.fleet import FleetDecoder
    from dy4tpu.utils import io as dio

    cfg = get_mode(args.mode)
    paths = args.captures * args.repeat
    raws = [dio.read_raw_u8(f) for f in paths]
    n_blocks = min(len(r) // cfg.block_size for r in raws)
    if args.max_blocks:
        n_blocks = min(n_blocks, args.max_blocks)
    if n_blocks == 0:
        print("captures shorter than one block", file=sys.stderr)
        return 1
    c = len(raws)
    iq = np.stack([r[:n_blocks * cfg.block_size] for r in raws])
    blocks = jnp.asarray(
        iq.reshape(c, n_blocks, cfg.block_size).transpose(1, 0, 2))

    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg, batch=(c,))

    @jax.jit
    def run(state, blocks):
        def body(st, blk):
            st, out = receiver.receiver_step(params, st, blk, cfg)
            return st, (out.rds_symbols, out.rds_resync)
        return lax.scan(body, state, blocks)

    _, (symbols, resync) = run(state, blocks)   # compile + warm-up
    jax.block_until_ready(symbols)
    t0 = time.perf_counter()
    _, (symbols, resync) = run(receiver.init_state(cfg, batch=(c,)),
                               blocks)
    jax.block_until_ready(symbols)
    dsp_s = time.perf_counter() - t0

    apps = [ApplicationLayer() for _ in range(c)]
    fleet = FleetDecoder(c, on_group=lambda ch, g: apps[ch].process(g))
    symbols = np.asarray(symbols)
    resync = np.asarray(resync)
    t0 = time.perf_counter()
    for b in range(n_blocks):
        fleet.push_block(symbols[b], resync[b])
    host_s = time.perf_counter() - t0

    iq_total = c * n_blocks * cfg.iq_per_block
    print(f"{c} stations x {n_blocks} blocks: DSP {dsp_s*1e3:.0f} ms "
          f"({iq_total/dsp_s/1e6:.0f} MS/s, "
          f"{iq_total/dsp_s/cfg.rf_fs:.0f}x real-time), "
          f"RDS host layer {host_s*1e3:.0f} ms", file=sys.stderr)
    for ch, (path, app) in enumerate(zip(paths, apps)):
        info = app.info
        rt = f" RT={info.radiotext!r}" if info.radiotext else ""
        print(f"[{ch:3d}] {path}: PI={info.pi_hex} PS={info.ps_name!r} "
              f"PTY={info.pty_name!r} ({info.groups_seen} groups){rt}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
