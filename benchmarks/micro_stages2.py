"""Scanned per-stage timing at the bench operating point (C=256, DEFAULT)."""
import time, numpy as np
from dy4tpu.utils import jaxenv; jaxenv.setup()
import jax, jax.numpy as jnp
from jax import lax
from dy4tpu.config import get_mode
from dy4tpu.ops import pll, fir, demod, mix
from dy4tpu.pipeline import receiver

cfg = get_mode(0)
C, B = 256, 8
P = lax.Precision.DEFAULT
rng = np.random.default_rng(0)
params = receiver.make_params(cfg)

def timeit(name, f, *args):
    o = f(*args); jax.block_until_ready(o)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); o = f(*args); jax.block_until_ready(o)
        ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1e3:8.2f} ms")

def devrand(shape):
    return jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32))(
        jax.random.PRNGKey(0))

def scan_stage(name, make_carry, body):
    xs = devrand((B, C, cfg.if_per_block))
    @jax.jit
    def run(c0, xs):
        def f(c, x):
            c2, y = body(c, x)
            return c2, y[..., :1]
        return lax.scan(f, c0, xs)
    timeit(name, run, make_carry(), xs)

# RF conv (iq rate): input [B, C, 2, iq_per_block]
xs_rf = devrand((B, C, 2, cfg.iq_per_block))
@jax.jit
def run_rf(c0, xs):
    def f(c, x):
        y, c2 = fir.block_fir_decim(x, params.rf_coeff, c, cfg.rf_decim, precision=P)
        return c2, y[..., :1]
    return lax.scan(f, c0, xs)
timeit("rf decim conv", run_rf, jnp.zeros((C,2,cfg.num_taps-1)), xs_rf)

scan_stage("bank conv (3 filt)", lambda: jnp.zeros((C,3,cfg.num_taps-1)),
           lambda c, x: (lambda y, c2: (c2, y[..., 0, :]))(*fir.block_fir_bank(x, params.bank_coeff, c, precision=P)))
scan_stage("audio resample", lambda: jnp.zeros((C, fir.state_len(cfg.audio_taps, cfg.audio_up))),
           lambda c, x: (lambda y, c2: (c2, y))(*fir.block_fir_resample(x, params.audio_coeff, c, up=cfg.audio_up, down=cfg.audio_down, precision=P)))
scan_stage("rds lpf resample", lambda: jnp.zeros((C, fir.state_len(cfg.rds_taps, cfg.rds_up))),
           lambda c, x: (lambda y, c2: (c2, y))(*fir.block_fir_resample(x, params.rds_lpf_coeff, c, up=cfg.rds_up, down=cfg.rds_down, precision=P)))
scan_stage("pll", lambda: pll.init_state((C,)),
           lambda c, x: (lambda i, q, c2: (c2, i))(*pll.pll(x, c, freq=19e3, fs=cfg.if_fs, nco_scale=2.0)))

# full chain
state = receiver.init_state(cfg, batch=(C,))
iq = jax.jit(lambda k: jax.random.randint(k, (B, C, cfg.block_size), 0, 256, jnp.uint8))(jax.random.PRNGKey(0))
@jax.jit
def run_full(st, bl):
    def f(s, b):
        s, o = receiver.receiver_step(params, s, b, cfg, precision=P)
        return s, (o.mono[..., :1], o.rds_symbols[..., :1])
    return lax.scan(f, st, bl)
timeit("FULL chain", run_full, state, iq)
