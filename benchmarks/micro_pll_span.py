"""A/B the span (decimated-feedback) PLL vs the exact per-sample loop.

Times the stacked 2-lane PLL stage at the serving shape (the receiver's
only per-IF-sample sequential chain) for span in {1, 4, 8, 16} with the
roofline harness's honest-sync chained-dispatch timing (block_until_ready
is a no-op through the axon tunnel, CLAUDE.md).
Run on the TPU: `python benchmarks/micro_pll_span.py`.
"""
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dy4tpu.config import get_mode            # noqa: E402
from dy4tpu.ops import pll                    # noqa: E402
from benchmarks.roofline import bench_scan, measure_dispatch_floor  # noqa: E402

cfg = get_mode(0)
C = int(os.environ.get("ROOF_CHANNELS", "512"))
B = int(os.environ.get("ROOF_BLOCKS", "48"))
n_if = cfg.if_per_block
key = jax.random.PRNGKey(0)
pin = jax.jit(lambda k: jax.random.normal(k, (B, C, 2, n_if)))(key)
jax.block_until_ready(pin)
floor = measure_dispatch_floor()
print(f"dispatch floor {floor*1e3:.1f} ms (subtracted); C={C} B={B}")

for span in (1, 4, 8, 16):
    def body(c, x, span=span):
        i, q, c2 = pll.pll(x, c,
                           freq=np.array([19e3, 114e3], np.float32),
                           fs=cfg.if_fs,
                           nco_scale=np.array([2.0, 0.5], np.float32),
                           norm_bandwidth=np.array([0.01, 0.001],
                                                   np.float32),
                           span=span)
        return c2, i

    dt = bench_scan(body, pll.init_state((C, 2)), pin) - floor
    print(f"span={span:3d}: {dt*1e3:8.2f} ms/batch  "
          f"({dt/B*1e6:7.1f} us/block, {B*C*2*n_if/dt/1e9:6.2f} G pll-samp/s)")
