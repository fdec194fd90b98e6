"""Benchmark: mode-0 full-chain (mono+stereo+RDS DSP) IQ throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MS/s", "vs_baseline": N}

``value`` is complex-IQ megasamples/s through the complete per-block
receiver on one chip (batched over channels, scanned over blocks).
``vs_baseline`` is the real-time factor vs the reference contract of one
station at 2.4 MS/s (constraints pdf p.2) — the reference C++ on an RPi 4
runs ~1x real time for one station with no RDS; BASELINE.md's north-star
target is >=62.5x per chip (1000x on 16 chips).
"""

from __future__ import annotations

import json
import os
import time

from dy4tpu.utils import jaxenv
jaxenv.setup()

import jax
import jax.numpy as jnp
from jax import lax

from dy4tpu.config import get_mode
from dy4tpu.pipeline import receiver


def main() -> None:
    cfg = get_mode(0)
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    channels = int(os.environ.get("BENCH_CHANNELS", 512 if on_tpu else 2))
    n_blocks = int(os.environ.get("BENCH_BLOCKS", 32 if on_tpu else 2))
    repeats = int(os.environ.get("BENCH_REPEATS", 5 if on_tpu else 2))
    # DEFAULT (bf16-input matmul) is the production-serving configuration:
    # benchmarks/precision_check.py measures bit-identical RDS symbols and
    # equal stereo separation vs HIGHEST on the synthesized broadcast.
    precision = {"default": lax.Precision.DEFAULT,
                 "high": lax.Precision.HIGH,
                 "highest": lax.Precision.HIGHEST}[
        os.environ.get("BENCH_PRECISION", "default")]

    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg, batch=(channels,))
    # generate the IQ stream on device: a host->device push of the full
    # tensor (GBs at large channel counts) would dominate setup time
    iq = jax.jit(
        lambda key: jax.random.randint(
            key, (n_blocks, channels, cfg.block_size), 0, 256, jnp.uint8),
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(iq)

    @jax.jit
    def run(state, blocks):
        def body(st, blk):
            st, out = receiver.receiver_step(params, st, blk, cfg,
                                             precision=precision)
            return st, (out.mono, out.left, out.right, out.rds_symbols)
        return lax.scan(body, state, blocks)

    # warm-up / compile
    st, outs = run(state, iq)
    jax.block_until_ready(outs)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        st, outs = run(st, iq)
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)

    best = min(times)
    iq_samples = n_blocks * channels * cfg.iq_per_block  # complex samples
    msps = iq_samples / best / 1e6
    rt = msps * 1e6 / cfg.rf_fs  # x-real-time (stations decoded live)
    print(json.dumps({
        "metric": "mode0_full_chain_iq_throughput_per_chip",
        "value": round(msps, 3),
        "unit": "MS/s",
        "vs_baseline": round(rt, 2),
    }))


if __name__ == "__main__":
    main()
