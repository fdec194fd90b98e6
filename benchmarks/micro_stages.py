import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
from dy4tpu.config import get_mode
from dy4tpu.ops import pll, fir, demod, mix
from dy4tpu.pipeline import receiver

cfg = get_mode(0)
C = 32
rng = np.random.default_rng(0)
params = receiver.make_params(cfg)

def timeit(name, f, *args):
    o = f(*args); jax.block_until_ready(o)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); o = f(*args); jax.block_until_ready(o)
        ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms")
    return min(ts)

# PLL scaling check
for n in (12288, 122880):
    x = jnp.asarray(rng.standard_normal((C, n)).astype(np.float32))
    st = pll.init_state((C,))
    f = jax.jit(lambda x, st: pll.pll(x, st, freq=19e3, fs=cfg.if_fs, nco_scale=2.0))
    timeit(f"pll N={n}", f, x, st)

# single receiver_step, one block
state = receiver.init_state(cfg, batch=(C,))
iq1 = jnp.asarray(rng.integers(0,256,(C,cfg.block_size),dtype=np.uint8))
f_step = jax.jit(lambda s, b: receiver.receiver_step(params, s, b, cfg))
t_step = timeit("one receiver_step (C=32)", f_step, state, iq1)

# scan of 16 steps
iq16 = jnp.asarray(rng.integers(0,256,(16,C,cfg.block_size),dtype=np.uint8))
@jax.jit
def run(state, blocks):
    def body(st, blk):
        st, out = receiver.receiver_step(params, st, blk, cfg)
        return st, (out.mono, out.left, out.right, out.rds_symbols)
    return lax.scan(body, state, blocks)
t16 = timeit("scan 16 steps", run, state, iq16)
print("per-step in scan:", t16/16*1e3, "ms vs single", t_step*1e3)

# stage-level: bank conv at IF rate, one block
fm = jnp.asarray(rng.standard_normal((C, cfg.if_per_block)).astype(np.float32))
bank_tail = jnp.zeros((C,3,cfg.num_taps-1))
f_bank = jax.jit(lambda x,t: fir.block_fir_bank(x, params.bank_coeff, t))
timeit("bank conv 1 block", f_bank, fm, bank_tail)

# audio resample 1 block
at = jnp.zeros((C, fir.state_len(cfg.audio_taps, cfg.audio_up)))
f_aud = jax.jit(lambda x,t: fir.block_fir_resample(x, params.audio_coeff, t, up=cfg.audio_up, down=cfg.audio_down))
timeit("audio resample 1 block", f_aud, fm, at)

# rds lpf resample (19/120) 1 block
rt = jnp.zeros((C, fir.state_len(cfg.rds_taps, cfg.rds_up)))
f_rds = jax.jit(lambda x,t: fir.block_fir_resample(x, params.rds_lpf_coeff, t, up=cfg.rds_up, down=cfg.rds_down))
timeit("rds resample 1 block (U=19/D=120, 1919 taps)", f_rds, fm, rt)

# rf conv one block
iqf = jnp.asarray(rng.standard_normal((C,2,cfg.iq_per_block)).astype(np.float32))
t2 = jnp.zeros((C,2,cfg.num_taps-1))
f_rf = jax.jit(lambda x,t: fir.block_fir_decim(x, params.rf_coeff, t, cfg.rf_decim))
timeit("rf conv 1 block", f_rf, iqf, t2)
