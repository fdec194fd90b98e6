"""Raw front kernel: overlap window-build with the dot (split-J probe).

Round-4 ROADMAP candidate: the kernel body is (build all J windows into
pg_s) then (one [BC*J, W] x [W, 2T] dot).  Splitting J into S slabs and
interleaving build(s+1) with dot(s) lets Mosaic overlap the VPU stores
with the MXU — IF the scheduler takes it, and IF the smaller per-dot M
doesn't lose more to pipeline drain than the overlap hides.

Run from the repo root on the TPU:  python -m benchmarks.micro_front_split
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
from dy4tpu.ops import firdes, frontend_pallas as fp

cfg = get_mode(0)
C = int(os.environ.get("MF_CHANNELS", 512))
B = int(os.environ.get("MF_BLOCKS", 48))
REP = int(os.environ.get("MF_REPEATS", 5))


def main():
    key = jax.random.PRNGKey(0)
    k = cfg.num_taps
    d = cfg.rf_decim
    bs = 2 * cfg.if_per_block * d
    h = jnp.asarray(firdes.lpf(cfg.rf_fs, cfg.rf_fc, k), jnp.float32)
    iq = jax.random.randint(key, (B, C, bs), 0, 256, jnp.uint8)
    tail0 = jnp.zeros((C, 2, k - 1), jnp.float32)
    pv0 = jnp.zeros((C,), jnp.float32)
    jax.block_until_ready((iq, h))

    for split in (1, 2, 3, 6):
        @jax.jit
        def run(iq, tail0, pv0, split=split):
            def body(carry, x):
                tail, pi, pq = carry
                fm, tail, pi, pq = fp.fused_frontend_raw(
                    x, h, tail, pi, pq, d, split=split)
                return (tail, pi, pq), fm[:, :1]
            return lax.scan(body, (tail0, pv0, pv0), iq)

        c, out = run(iq, tail0, pv0)
        np.asarray(out[..., :1])
        t0 = time.perf_counter()
        for _ in range(REP):
            c, out = run(iq, tail0, pv0)
        np.asarray(out[..., :1])
        dt = (time.perf_counter() - t0) / REP * 1e3
        print(f"split={split}:  {dt:8.2f} ms / {B}-block batch "
              f"({dt / B:6.3f} ms/block)")


if __name__ == "__main__":
    main()
