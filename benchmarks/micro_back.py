"""Back-end breakdown: where the full chain's non-roofline ~45 ms goes.

The roofline stages (front, bank, PLL, two resamplers) sum to ~95 ms at
C=512 B=48 while the full chain measures ~141 ms; this times the
remaining pieces — NCO synthesis, mixers/delay, RRC, CDR, quantize —
via cumulative receiver stage compositions (front / front+PLL / full)
and isolated micro-kernels, all honest-sync (chained scan + one fetch).

Run from the repo root on the TPU:  python -m benchmarks.micro_back
"""
import os
import time

from dy4tpu.utils import jaxenv
jaxenv.setup()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dy4tpu.config import get_mode
from dy4tpu.ops import fir, mix, pll
from dy4tpu.pipeline import receiver

cfg = get_mode(0)
C = int(os.environ.get("MB_CHANNELS", 512))
B = int(os.environ.get("MB_BLOCKS", 48))
P = lax.Precision.DEFAULT
params = receiver.make_params(cfg)
key = jax.random.PRNGKey(0)
n_if = cfg.if_per_block


def bench_scan(body, carry0, xs, repeats=5):
    @jax.jit
    def run(c0, xs):
        def f(c, x):
            c2, y = body(c, x)
            return c2, jax.tree.map(lambda a: a[..., :1], y)
        return lax.scan(f, c0, xs)

    c, out = run(carry0, xs)
    np.asarray(jax.tree.leaves(out)[0][..., :1])
    t0 = time.perf_counter()
    for _ in range(repeats):
        c, out = run(c, xs)
    np.asarray(jax.tree.leaves(out)[0][..., :1])
    return (time.perf_counter() - t0) / repeats * 1e3


def main():
    iq = jax.jit(lambda k: jax.random.randint(
        k, (B, C, cfg.block_size), 0, 256, jnp.uint8))(key)
    fmr = jax.jit(lambda k: jax.random.normal(k, (B, C, n_if)))(key)
    jax.block_until_ready((iq, fmr))
    rows = []

    # cumulative compositions
    st0 = receiver.init_state(cfg, batch=(C,))
    f0 = receiver.front_state_of(st0)

    def front_only(c, x):
        c2, fo = receiver.front_step(params, c, x, cfg, precision=P)
        return c2, fo.fm_delayed
    rows.append(("front_step (fused+bank+delay)",
                 bench_scan(front_only, f0, iq)))

    def full(c, x):
        c2, o = receiver.receiver_step(params, c, x, cfg, precision=P)
        return c2, (o.mono, o.rds_symbols)
    rows.append(("FULL receiver_step", bench_scan(full, st0, iq)))

    # isolated back-end pieces at the same rates
    two = jax.jit(lambda k: jax.random.normal(k, (B, C, 2, n_if)))(key)
    jax.block_until_ready(two)

    def nco_synth(c, x):
        # cos+sin at IF rate x2 lanes (the exact-PLL NCO synthesis cost)
        y = jnp.cos(x) + jnp.sin(x)
        return c, y[..., 0, :]
    rows.append(("cos+sin x2 lanes (IF rate)",
                 bench_scan(nco_synth, jnp.zeros(()), two)))

    def mixers(c, x):
        a = mix.mix(x[..., 0, :], x[..., 1, :], gain=2.0)
        b = mix.mix(x[..., 0, :], x[..., 1, :], gain=2.0)
        return c, a + b
    rows.append(("3x elementwise mix (IF rate)",
                 bench_scan(mixers, jnp.zeros(()), two)))

    rrc_in = jax.jit(lambda k: jax.random.normal(
        k, (B, C, 2, cfg.rds_per_block)))(key)
    jax.block_until_ready(rrc_in)

    def rrc(c, x):
        y, c2 = fir.block_fir(x, params.rds_rrc_coeff, c, precision=P)
        return c2, y[..., 0, :]
    rows.append(("RRC FIR x2 (rds rate)",
                 bench_scan(rrc, jnp.zeros((C, 2, cfg.rds_rrc_taps - 1)),
                            rrc_in)))

    def cdr_stage(c, x):
        _i, _q, sym, rs, c2 = receiver._cdr(
            x[..., 0, :], x[..., 1, :], c, cfg.rds_sps)
        return c2, sym
    cdr0 = receiver.CDRState(offset=jnp.zeros((C,), jnp.int32),
                             found=jnp.zeros((C,), bool))
    rows.append(("CDR (rds rate)", bench_scan(cdr_stage, cdr0, rrc_in)))

    aud = jax.jit(lambda k: jax.random.normal(
        k, (B, C, 2, cfg.audio_per_block)))(key)
    jax.block_until_ready(aud)

    def quant(c, x):
        return c, mix.quantize_s16(mix.interleave(x[..., 0, :],
                                                  x[..., 1, :]))
    rows.append(("interleave+quantize (audio rate)",
                 bench_scan(quant, jnp.zeros(()), aud)))

    print(f"C={C} B={B} DEFAULT precision (ms per {B}-block batch)")
    for name, ms in rows:
        print(f"{name:34s} {ms:8.2f}")


if __name__ == "__main__":
    main()
