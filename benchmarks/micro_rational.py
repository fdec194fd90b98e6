"""bc_rows sweep for the rational back-end kernels (VERDICT r4 items
1c/5).

Each 128-output tile of the rational resampler owns its OWN banded
matrix, so the kernel cannot batch tiles into one dot the way the U=1
back end does (its tile-invariant plan gives M = bc*J = 96); every dot
runs at M = bc_rows.  M=8 leaves the MXU pipeline-drain-bound — this
sweep measures whether more channel rows per grid cell (M=16/32/64)
buys the modes-2/3 audio and RDS kernels real time.

Usage: python benchmarks/micro_rational.py [--blocks 48] [--repeats 3]
Chained-dispatch timing (carried tails serialise the scan), one tiny
fetch at the end — the honest-sync protocol from BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from dy4tpu.utils import jaxenv  # noqa: E402
jaxenv.setup()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from dy4tpu.config import get_mode  # noqa: E402
from dy4tpu.ops import resample_pallas  # noqa: E402
from dy4tpu.pipeline import receiver  # noqa: E402


def time_audio(mode: int, bc: int, c: int, blocks: int, repeats: int):
    cfg = get_mode(mode)
    params = receiver.make_params(cfg)
    h = params.audio_coeff
    n_in = cfg.if_per_block
    s_len = (h.shape[0] - 1) // cfg.audio_up
    key = jax.random.PRNGKey(0)
    fm = jax.random.normal(key, (blocks, c, n_in), jnp.float32)
    sb = jax.random.normal(key, (blocks, c, n_in), jnp.float32)
    nco = jax.random.normal(key, (blocks, c, n_in), jnp.float32)
    tails = (jnp.zeros((c, s_len)), jnp.zeros((c, s_len)))

    @jax.jit
    def run(tails, fm, sb, nco):
        def body(t, x):
            mono, left, right, mt, st = \
                resample_pallas.fused_audio_backend_rational(
                    x[0], x[1], x[2], h, t[0], t[1],
                    cfg.audio_up, cfg.audio_down, bc_rows=bc)
            return (mt, st), mono[:, :1]
        return lax.scan(body, tails, (fm, sb, nco))

    t, out = run(tails, fm, sb, nco)
    np.asarray(out[..., :1])
    t0 = time.perf_counter()
    for _ in range(repeats):
        t, out = run(t, fm, sb, nco)
    np.asarray(out[..., :1])
    return (time.perf_counter() - t0) / repeats


def time_rds(mode: int, bc: int, c: int, blocks: int, repeats: int):
    cfg = get_mode(mode)
    params = receiver.make_params(cfg, with_rds=True)
    h = params.rds_lpf_coeff
    h2 = params.rds_rrc_coeff
    n_in = cfg.if_per_block
    s_len = (h.shape[0] - 1) // cfg.rds_up
    s2 = h2.shape[0] - 1
    key = jax.random.PRNGKey(0)
    rds = jax.random.normal(key, (blocks, c, n_in), jnp.float32)
    ni = jax.random.normal(key, (blocks, c, n_in), jnp.float32)
    nq = jax.random.normal(key, (blocks, c, n_in), jnp.float32)
    tails = (jnp.zeros((c, s_len)), jnp.zeros((c, s_len)),
             jnp.zeros((c, s2)), jnp.zeros((c, s2)))

    @jax.jit
    def run(tails, rds, ni, nq):
        def body(t, x):
            bbi, bbq, li, lq, ri, rq = resample_pallas.fused_rds_backend(
                x[0], x[1], x[2], h, h2, t[0], t[1], t[2], t[3],
                cfg.rds_up, cfg.rds_down, bc_rows=bc)
            return (li, lq, ri, rq), bbi[:, :1]
        return lax.scan(body, tails, (rds, ni, nq))

    t, out = run(tails, rds, ni, nq)
    np.asarray(out[..., :1])
    t0 = time.perf_counter()
    for _ in range(repeats):
        t, out = run(t, rds, ni, nq)
    np.asarray(out[..., :1])
    return (time.perf_counter() - t0) / repeats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=512)
    ap.add_argument("--blocks", type=int, default=48)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--bcs", default="8,16,32,64")
    ap.add_argument("--kernels", default="audio2,audio3,rds0,rds2")
    args = ap.parse_args()
    bcs = [int(b) for b in args.bcs.split(",")]
    kernels = args.kernels.split(",")

    for name in kernels:
        fn, mode = {"audio2": (time_audio, 2), "audio3": (time_audio, 3),
                    "rds0": (time_rds, 0), "rds2": (time_rds, 2)}[name]
        for bc in bcs:
            try:
                dt = fn(mode, bc, args.channels, args.blocks, args.repeats)
                print(json.dumps({"kernel": name, "bc": bc,
                                  "ms_per_batch": round(dt * 1e3, 2)}),
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"kernel": name, "bc": bc,
                                  "error": f"{type(e).__name__}: "
                                           f"{e}"[:200]}), flush=True)


if __name__ == "__main__":
    main()
