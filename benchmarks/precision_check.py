"""TPU decode quality + speed at each conv precision tier.

Synthesizes a stereo+RDS broadcast, runs the full receiver at
DEFAULT/HIGH/HIGHEST precision on the real chip, and reports stereo tone
SNR and RDS symbol agreement vs the HIGHEST reference.
"""
import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
from dy4tpu.config import get_mode
from dy4tpu.pipeline import receiver
from dy4tpu.rds import coding
from dy4tpu.rds.decoder import RDSDecoder
from dy4tpu.rds.app import ApplicationLayer
from dy4tpu.tx import fm

cfg = get_mode(0)
n_blocks = 20
n_audio = n_blocks * cfg.audio_per_block
bits = coding.make_ps_bitstream(0xF205, 10, "PRECTEST", repeats=60)
iq = fm.synthesize(cfg, n_blocks,
                   left=fm.tone(800., cfg.audio_fs, n_audio, 0.7),
                   right=fm.tone(2400., cfg.audio_fs, n_audio, 0.7),
                   rds_bits=bits)
blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))
params = receiver.make_params(cfg)

def run(prec):
    st = receiver.init_state(cfg)
    @jax.jit
    def go(st, bl):
        def body(s, b):
            s, o = receiver.receiver_step(params, s, b, cfg, precision=prec)
            return s, (o.left, o.rds_symbols, o.rds_resync)
        return lax.scan(body, st, bl)
    _, (left, syms, resync) = go(st, blocks)
    jax.block_until_ready(left)
    t0 = time.perf_counter()
    _, (left, syms, resync) = go(receiver.init_state(cfg), blocks)
    jax.block_until_ready(left)
    dt = time.perf_counter() - t0
    return np.asarray(left), np.asarray(syms), np.asarray(resync), dt

results = {}
for name, prec in [("highest", lax.Precision.HIGHEST),
                   ("high", lax.Precision.HIGH),
                   ("default", lax.Precision.DEFAULT)]:
    left, syms, resync, dt = run(prec)
    app = ApplicationLayer(); dec = RDSDecoder(on_group=app.process)
    for b in range(n_blocks):
        dec.push_block(syms[b], resync=bool(resync[b]))
    l = left[3:].ravel()
    t = np.arange(len(l)) / cfg.audio_fs
    want = np.abs(l @ np.exp(-2j*np.pi*800.0*t)) / len(l)
    leak = np.abs(l @ np.exp(-2j*np.pi*2400.0*t)) / len(l)
    results[name] = (syms, dt)
    print(f"{name:8s}: {dt*1e3:7.1f} ms  sep={20*np.log10(want/leak):5.1f} dB "
          f"groups={app.info.groups_seen} PS={app.info.ps_name!r}")

ref = results["highest"][0]
for name in ("high", "default"):
    agree = float((results[name][0] == ref).mean())
    print(f"{name} symbol agreement vs highest: {agree:.4f}")
