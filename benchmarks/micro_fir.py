import time, numpy as np, jax, jax.numpy as jnp
from dy4tpu.ops import fir, fir_pallas
from dy4tpu.config import get_mode
cfg = get_mode(0)
rng = np.random.default_rng(0)
B = 128  # 64 ch x I/Q
n = cfg.iq_per_block
x = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
h = jnp.asarray(rng.standard_normal(101).astype(np.float32))
st = jnp.asarray(rng.standard_normal((B, 100)).astype(np.float32))

def timeit(name, f, *args):
    o = f(*args); jax.block_until_ready(o)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter(); o = f(*args); jax.block_until_ready(o)
        ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1e3:.3f} ms")

f_mm = jax.jit(lambda x, st: fir.block_fir_decim(x, h, st, cfg.rf_decim, impl="matmul"))
f_pl = jax.jit(lambda x, st: fir_pallas.block_fir_decim_pallas(x, h, st, cfg.rf_decim))
# correctness on TPU
y1, _ = f_mm(x, st); y2, _ = f_pl(x, st)
print("tpu err:", float(jnp.max(jnp.abs(y1-y2))))
timeit("matmul rf decim B=128", f_mm, x, st)
timeit("pallas rf decim B=128", f_pl, x, st)

# scanned (amortize dispatch): 16 iterations
def scan_of(f):
    @jax.jit
    def g(st, xs):
        def body(c, xx):
            y, c2 = f(xx, c)
            return c2, y[..., :1]
        return jax.lax.scan(body, st, xs)
    return g
xs = jnp.asarray(rng.standard_normal((16, B, n)).astype(np.float32))
g_mm = scan_of(lambda xx, c: fir.block_fir_decim(xx, h, c, cfg.rf_decim, impl="matmul"))
g_pl = scan_of(lambda xx, c: fir_pallas.block_fir_decim_pallas(xx, h, c, cfg.rf_decim))
timeit("matmul scan16", g_mm, st, xs)
timeit("pallas scan16", g_pl, st, xs)
