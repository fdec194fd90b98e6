"""Multi-run per-mode chain bench: pin the real run-to-run noise band.

VERDICT r4 item 1(a): re-measure modes 0-3 with >=3 timed samples each at
the serving point and report mean +- spread, all in ONE process so every
mode's graph compiles once and the samples share the chip phase.

Usage:  python benchmarks/multi_mode.py [--modes 0,1,2,3] [--samples 3]
Emits one JSON line per mode with the individual samples, mean and
spread, plus a trailing summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from dy4tpu.utils import jaxenv
jaxenv.setup()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dy4tpu.config import get_mode
from dy4tpu.pipeline import receiver

from bench import _broadcast_blocks, _validate  # noqa: E402


def bench_mode(radio_mode: int, channels: int, n_blocks: int,
               repeats: int, samples: int):
    cfg = get_mode(radio_mode)
    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg, batch=(channels,))
    iq = _broadcast_blocks(cfg, n_blocks, channels)

    @jax.jit
    def run(state, blocks):
        def body(st, blk):
            st, out = receiver.receiver_step(
                params, st, blk, cfg, precision=lax.Precision.DEFAULT)
            return st, (out.mono, out.left, out.right, out.rds_symbols,
                        out.rds_resync)
        return lax.scan(body, state, blocks)

    st, outs = run(state, iq)
    np.asarray(outs[0][..., :1])
    _validate(cfg, outs, n_blocks)

    iq_samples = n_blocks * channels * cfg.iq_per_block
    vals = []
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(repeats):
            st, outs = run(st, iq)
        np.asarray(outs[0][..., :1])
        wall = (time.perf_counter() - t0) / repeats
        vals.append(iq_samples / wall / 1e6)
    return vals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="0,1,2,3")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--channels", type=int, default=512)
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    summary = {}
    for m in [int(x) for x in args.modes.split(",")]:
        vals = bench_mode(m, args.channels, args.blocks, args.repeats,
                          args.samples)
        mean = float(np.mean(vals))
        spread = float((max(vals) - min(vals)) / mean * 100)
        summary[f"mode{m}"] = round(mean, 1)
        print(json.dumps({
            "mode": m,
            "samples_ms_s": [round(v, 1) for v in vals],
            "mean": round(mean, 1),
            "spread_pct": round(spread, 2),
        }), flush=True)
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
