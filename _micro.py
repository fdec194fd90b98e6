import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
from dy4tpu.config import get_mode
from dy4tpu.ops import pll, fir
from dy4tpu.pipeline import receiver

cfg = get_mode(0)
C, B = 32, 16
rng = np.random.default_rng(0)

def timeit(name, f, *args):
    o = f(*args); jax.block_until_ready(o)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); o = f(*args); jax.block_until_ready(o)
        ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms")

# PLL alone over one bench-run worth of IF samples
x = jnp.asarray(rng.standard_normal((C, B*cfg.if_per_block)).astype(np.float32))
st = pll.init_state((C,))
f_pll = jax.jit(lambda x, st: pll.pll(x, st, freq=19e3, fs=cfg.if_fs, nco_scale=2.0))
timeit("pll 32ch x 122880 steps", f_pll, x, st)

# RF conv alone
iqb = jnp.asarray(rng.integers(0,256,(C,2,B*cfg.iq_per_block),dtype=np.uint8).astype(np.float32))
params = receiver.make_params(cfg)
tail = jnp.zeros((C,2,cfg.num_taps-1))
f_conv = jax.jit(lambda x, t: fir.block_fir_decim(x, params.rf_coeff, t, cfg.rf_decim))
timeit("rf conv 32ch x 1.2M samp", f_conv, iqb, tail)

# full step scan (the bench)
state = receiver.init_state(cfg, batch=(C,))
iq = jnp.asarray(rng.integers(0,256,(B,C,cfg.block_size),dtype=np.uint8))
@jax.jit
def run(state, blocks):
    def body(st, blk):
        st, out = receiver.receiver_step(params, st, blk, cfg)
        return st, (out.mono, out.left, out.right, out.rds_symbols)
    return lax.scan(body, state, blocks)
timeit("full chain", run, state, iq)
