"""Wideband-step breakdown: where the channelizer pipeline's time goes.

The wideband bench (32 bands x 16 ch = 512 stations, 32 steps) measures
~5.5 ms/step while the RF chain does a full 512-channel block — with a
10x-rate RF front end the IF path skips — in ~2.4 ms.  This times the
pieces: channelize_block alone, receiver_step_if alone (flat 512 batch
and nested [32,16] batch), and the combined wideband_step, all
honest-sync (chained scan + one tiny fetch).

Run from the repo root on the TPU:  python -m benchmarks.micro_wideband
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
from dy4tpu.ops import channelizer as chz
from dy4tpu.pipeline import receiver, wideband

cfg = get_mode(0)
BANDS = int(os.environ.get("MW_BANDS", 32))
CBANK = int(os.environ.get("MW_CHANNELS", 16))
STEPS = int(os.environ.get("MW_STEPS", 16))
P = lax.Precision.DEFAULT
n_if = cfg.if_per_block
n_w = CBANK * n_if


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
    return (time.perf_counter() - t0) / repeats / STEPS * 1e3


def main():
    key = jax.random.PRNGKey(0)
    params = receiver.make_params(cfg)
    chan = wideband.make_wideband(cfg, CBANK)

    wb_u8 = jax.random.randint(key, (STEPS, BANDS, 2 * n_w), 0, 256,
                               jnp.uint8)
    xi = jax.random.normal(key, (STEPS, BANDS, n_w), jnp.float32)
    xq = jax.random.normal(key, (STEPS, BANDS, n_w), jnp.float32)
    yi = jax.random.normal(key, (STEPS, BANDS, CBANK, n_if), jnp.float32)
    yq = jax.random.normal(key, (STEPS, BANDS, CBANK, n_if), jnp.float32)
    yif = yi.reshape(STEPS, BANDS * CBANK, n_if)
    yqf = yq.reshape(STEPS, BANDS * CBANK, n_if)
    jax.block_until_ready((wb_u8, xi, xq, yi, yq))

    # 1. channelizer alone (f32 in, [BANDS] batch)
    st = chz.init_channelizer_state(chan, batch=(BANDS,))
    t = bench_scan(
        lambda s, x: tuple(reversed(chz.channelize_block(
            chan, s, x[0], x[1], precision=P))),
        st, (xi, xq))
    print(f"channelize_block [{BANDS}] batch:        {t:8.3f} ms/step")

    # 2. receiver_step_if, flat [BANDS*CBANK] batch
    rx0 = receiver.init_state(cfg, batch=(BANDS * CBANK,))
    t = bench_scan(
        lambda s, x: receiver.receiver_step_if(params, s, x[0], x[1],
                                               cfg, precision=P),
        rx0, (yif, yqf))
    print(f"receiver_step_if flat [{BANDS * CBANK}]:        {t:8.3f} ms/step")

    # 3. receiver_step_if, nested [BANDS, CBANK] batch
    rx0 = receiver.init_state(cfg, batch=(BANDS, CBANK))
    t = bench_scan(
        lambda s, x: receiver.receiver_step_if(params, s, x[0], x[1],
                                               cfg, precision=P),
        rx0, (yi, yq))
    print(f"receiver_step_if nested [{BANDS},{CBANK}]:    {t:8.3f} ms/step")

    # 3b. stock front A/B on the flat batch
    os.environ["DY4TPU_FRONTEND"] = "stock"
    rx0 = receiver.init_state(cfg, batch=(BANDS * CBANK,))
    t = bench_scan(
        lambda s, x: receiver.receiver_step_if(params, s, x[0], x[1],
                                               cfg, precision=P),
        rx0, (yif, yqf))
    del os.environ["DY4TPU_FRONTEND"]
    print(f"receiver_step_if flat, stock front:  {t:8.3f} ms/step")

    # 3c. u8 normalize + deinterleave + channelize (isolates the ingest
    # conversion cost vs stage 1's device-resident f32 planes)
    st = chz.init_channelizer_state(chan, batch=(BANDS,))

    def u8_chan(s, x, deint):
        if deint == "strided":
            xf = (x.astype(jnp.float32) - 128.0) / 128.0
            xi, xq = xf[..., 0::2], xf[..., 1::2]
        else:
            w = x.reshape(*x.shape[:-1], -1, 2)
            xi = (w[..., 0].astype(jnp.float32) - 128.0) / 128.0
            xq = (w[..., 1].astype(jnp.float32) - 128.0) / 128.0
        y, s2 = chz.channelize_block(chan, s, xi, xq, precision=P)
        return s2, y

    for deint in ("strided", "reshape"):
        t = bench_scan(lambda s, x, d=deint: u8_chan(s, x, d), st, wb_u8)
        print(f"u8->channelize ({deint}):         {t:8.3f} ms/step")

    # 4. the whole wideband_step (AFC off = serving default, then on)
    for use_afc in (False, True):
        ws = wideband.wideband_init(cfg, chan, batch=(BANDS,),
                                    afc=use_afc)
        t = bench_scan(
            lambda s, x: wideband.wideband_step(params, chan, s, x, cfg,
                                                precision=P),
            ws, wb_u8)
        tag = "afc on " if use_afc else "default"
        print(f"wideband_step [{BANDS}]x{CBANK} ({tag}):    {t:8.3f} ms/step")


if __name__ == "__main__":
    main()
