"""Per-stage roofline: time, minimum HBM bytes, achieved GB/s, %-of-peak.

Substantiates the BASELINE "filter/FFT kernels at HBM speed-of-light"
row (VERDICT r1 item 1): for every receiver stage at the bench operating
point we report wall-clock (scanned, so dispatch-amortised), the
*minimum* HBM traffic the stage's dataflow implies (inputs read once +
outputs written once), the achieved effective bandwidth against that
minimum, and the fraction of the chip's peak HBM bandwidth.  A stage at
100% reads/writes its streams exactly once at full memory speed; lower
numbers mean either extra round trips (fusion opportunity) or
compute-bound kernels.

Run on the TPU:  python benchmarks/roofline.py
Env: ROOF_MODE (0-3), ROOF_CHANNELS (default 512), ROOF_BLOCKS (8),
ROOF_PRECISION.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from dy4tpu.utils import jaxenv
jaxenv.setup()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dy4tpu.config import get_mode
from dy4tpu.ops import fir, pll
from dy4tpu.pipeline import receiver

# Peak HBM bandwidth by device kind (GB/s).  v5e: 819 GB/s (public spec);
# fall back to v5e's number for unknown kinds so %peak stays meaningful.
PEAK_GBS = {
    "TPU v4": 1228.0,
    "TPU v5e": 819.0,
    "TPU v5 lite": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6e": 1640.0,
}


def peak_for(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in PEAK_GBS.items():
        if kind.startswith(k):
            return v
    return 819.0


def bench_scan(body, carry0, xs, repeats=5):
    """Wall-clock per run of a jitted lax.scan over the leading axis of
    xs.  Chains ``repeats`` dependent dispatches (via the carry) and
    forces ONE tiny host fetch at the end: through the axon tunnel
    ``jax.block_until_ready`` returns before remote execution finishes,
    so only a data fetch is a real synchronisation point."""
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
    return (time.perf_counter() - t0) / repeats


def measure_dispatch_floor(repeats: int = 5, tries: int = 3) -> float:
    """Fixed per-call overhead (jit dispatch + amortised tunnel fetch) —
    subtracted from every stage so the table reflects device time.
    Measured the same way as the stages (chained dispatches + one end
    fetch) so it cancels the same costs.  MIN of several tries: the
    tunnel has slow phases (one round measured a 15 ms sample where
    the steady floor is ~5 ms), and an inflated floor turns fast
    stages into nonsense negative times."""
    x = jnp.ones((8,))
    f = jax.jit(lambda a: a * 2.0)
    np.asarray(f(x))
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        v = x
        for _ in range(repeats):
            v = f(v)
        np.asarray(v)
        best = min(best, (time.perf_counter() - t0) / repeats)
    return best


def main() -> None:
    cfg = get_mode(int(os.environ.get("ROOF_MODE", 0)))
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    C = int(os.environ.get("ROOF_CHANNELS", 512 if on_tpu else 2))
    B = int(os.environ.get("ROOF_BLOCKS", 48 if on_tpu else 2))
    P = {"default": lax.Precision.DEFAULT, "high": lax.Precision.HIGH,
         "highest": lax.Precision.HIGHEST}[
        os.environ.get("ROOF_PRECISION", "default")]
    peak = peak_for(dev)
    params = receiver.make_params(cfg)
    key = jax.random.PRNGKey(0)
    floor = measure_dispatch_floor()

    n_if = cfg.if_per_block
    rows = []

    def report(name, dt, bytes_min, flops=0):
        if dt < floor * 1.5:
            # stage indistinguishable from the dispatch floor at this
            # geometry — print the wall time, refuse to extrapolate
            rows.append((name + " (<~floor)", (dt - floor) * 1e3,
                         bytes_min / 1e6, float("nan"), float("nan"),
                         float("nan")))
            return
        dt = max(dt - floor, 1e-6)      # remove fixed dispatch latency
        gbs = bytes_min / dt / 1e9
        rows.append((name, dt * 1e3, bytes_min / 1e6, gbs,
                     100.0 * gbs / peak, flops / dt / 1e12))

    f32 = 4

    # ---- RF front end: u8 block -> decimated I/Q (the RF-rate stage) ----
    iq_u8 = jax.jit(lambda k: jax.random.randint(
        k, (B, C, 2, cfg.iq_per_block), 0, 256, jnp.uint8))(key)
    jax.block_until_ready(iq_u8)

    def rf_body(c, x):
        xf = (x.astype(jnp.float32) - 128.0) / 128.0
        y, c2 = fir.block_fir_decim(xf, params.rf_coeff, c, cfg.rf_decim,
                                    precision=P)
        return c2, y
    dt = bench_scan(rf_body, jnp.zeros((C, 2, cfg.num_taps - 1)), iq_u8)
    # min traffic: u8 in once, decimated f32 out once
    b_min = B * C * (2 * cfg.iq_per_block * 1 + 2 * n_if * f32)
    report("rf u8->decim FIR", dt, b_min,
           flops=B * C * 2 * cfg.num_taps * n_if * 2)
    del iq_u8

    # ---- fused front end (u8 -> fm), when available ----
    try:
        from dy4tpu.ops import frontend_pallas
        iq_blk = jax.jit(lambda k: jax.random.randint(
            k, (B, C, cfg.block_size), 0, 256, jnp.uint8))(key)
        jax.block_until_ready(iq_blk)

        for label, kern in (
                ("FUSED u8->fm (raw)", frontend_pallas.fused_frontend_raw),
                ("fused u8->fm (phase)", frontend_pallas.fused_frontend)):
            def fe_body(c, x, kern=kern):
                tail, pi, pq = c
                fm, tail2, pi2, pq2 = kern(
                    x, params.rf_coeff, tail, pi, pq, cfg.rf_decim)
                return (tail2, pi2, pq2), fm
            c0 = (jnp.zeros((C, 2, cfg.num_taps - 1)), jnp.zeros((C,)),
                  jnp.zeros((C,)))
            dt = bench_scan(fe_body, c0, iq_blk)
            b_min = B * C * (cfg.block_size * 1 + n_if * f32)
            report(label, dt, b_min,
                   flops=B * C * (2 * cfg.num_taps + 5) * n_if * 2)
        del iq_blk
    except ImportError:
        pass

    # ---- band bank (3 BPFs over fm) ----
    fm = jax.jit(lambda k: jax.random.normal(k, (B, C, n_if)))(key)
    jax.block_until_ready(fm)

    def bank_body(c, x):
        y, c2 = fir.block_fir_bank(x, params.bank_coeff, c, precision=P)
        return c2, y
    dt = bench_scan(bank_body, jnp.zeros((C, 3, cfg.num_taps - 1)), fm)
    report("band bank (3 BPF)", dt, B * C * (n_if * f32 + 3 * n_if * f32),
           flops=B * C * 3 * cfg.num_taps * n_if * 2)
    del fm

    # ---- audio resampler (2 lanes mono+stereo) ----
    aud_in = jax.jit(lambda k: jax.random.normal(k, (B, C, 2, n_if)))(key)
    jax.block_until_ready(aud_in)

    def aud_body(c, x):
        y, c2 = fir.block_fir_resample(x, params.audio_coeff, c,
                                       up=cfg.audio_up, down=cfg.audio_down,
                                       precision=P)
        return c2, y
    c0 = jnp.zeros((C, 2, fir.state_len(cfg.audio_taps, cfg.audio_up)))
    dt = bench_scan(aud_body, c0, aud_in)
    report("audio resample x2", dt,
           B * C * 2 * (n_if + cfg.audio_per_block) * f32,
           flops=B * C * 2 * cfg.num_taps * cfg.audio_per_block * 2)

    # ---- RDS LPF resampler (19/120, I+Q lanes) ----
    if not cfg.supports_rds:
        del aud_in
        rds_skip = True
    else:
        rds_skip = False

    def rds_body(c, x):
        y, c2 = fir.block_fir_resample(x, params.rds_lpf_coeff, c,
                                       up=cfg.rds_up, down=cfg.rds_down,
                                       precision=P)
        return c2, y
    if not rds_skip:
        c0 = jnp.zeros((C, 2, fir.state_len(cfg.rds_taps, cfg.rds_up)))
        dt = bench_scan(rds_body, c0, aud_in)
        report("rds resample x2", dt,
               B * C * 2 * (n_if + cfg.rds_per_block) * f32,
               flops=B * C * 2 * cfg.num_taps * cfg.rds_per_block * 2)
        del aud_in

    # ---- SERVING fused back ends (the stock rows above are the XLA
    # A/B; the chain actually runs these Pallas kernels) ----
    try:
        from dy4tpu.ops import backend_pallas, resample_pallas
        apb = cfg.audio_per_block
        fm3 = jax.jit(lambda k: jax.random.normal(k, (B, C, 3, n_if)))(key)
        jax.block_until_ready(fm3)

        use_u1 = cfg.audio_up == 1

        if use_u1:
            def fab_body(c, x):
                mono, left, right, mt, st = \
                    backend_pallas.fused_audio_backend(
                        x[:, 0], x[:, 1], x[:, 2], params.audio_coeff,
                        c[0], c[1], cfg.audio_down,
                        mm_dtype=(jnp.float32
                                  if P == lax.Precision.HIGHEST
                                  else jnp.bfloat16))
                return (mt, st), mono
            s_tail = cfg.audio_taps - 1
            wlen = cfg.audio_down * 128 + 128        # tile window rows
        else:
            def fab_body(c, x):
                mono, left, right, mt, st = \
                    resample_pallas.fused_audio_backend_rational(
                        x[:, 0], x[:, 1], x[:, 2], params.audio_coeff,
                        c[0], c[1], cfg.audio_up, cfg.audio_down,
                        mm_dtype=(jnp.float32
                                  if P == lax.Precision.HIGHEST
                                  else jnp.bfloat16))
                return (mt, st), mono
            s_tail = fir.state_len(cfg.audio_taps, cfg.audio_up)
            # slab-plan window rows per 128-output tile (lane-aligned)
            wlen = (-(-(128 * cfg.audio_down // cfg.audio_up + 128)
                      // 128)) * 128
        dt = bench_scan(fab_body,
                        (jnp.zeros((C, s_tail)), jnp.zeros((C, s_tail))),
                        fm3)
        # min traffic: fm + stereo_band + nco read once, mono/L/R written
        b_min = B * C * (3 * n_if + 3 * apb) * f32
        # banded-formulation MACs (the masked-redundancy trade), vs k
        # MACs/output for the dense count
        flops_banded = B * C * 2 * wlen * apb * 2
        report("FUSED audio backend", dt, b_min, flops=flops_banded)

        if not cfg.supports_rds:
            raise ImportError("no RDS in this mode")  # skip rds row

        def frb_body(c, x):
            bbi, bbq, li, lq, ri, rq = resample_pallas.fused_rds_backend(
                x[:, 0], x[:, 1], x[:, 2], params.rds_lpf_coeff,
                params.rds_rrc_coeff, c[0], c[1], c[2], c[3],
                cfg.rds_up, cfg.rds_down,
                mm_dtype=(jnp.float32 if P == lax.Precision.HIGHEST
                          else jnp.bfloat16))
            return (li, lq, ri, rq), bbi
        s1 = fir.state_len(cfg.rds_taps, cfg.rds_up)
        s2 = cfg.rds_rrc_taps - 1
        dt = bench_scan(frb_body,
                        (jnp.zeros((C, s1)), jnp.zeros((C, s1)),
                         jnp.zeros((C, s2)), jnp.zeros((C, s2))), fm3)
        rpb = cfg.rds_per_block
        b_min = B * C * (3 * n_if + 2 * rpb) * f32
        # resampler tile window (slab plan) + decim-1 RRC window
        w_res = (128 * cfg.rds_down) // cfg.rds_up + 256
        flops_banded = B * C * 2 * (w_res * rpb + 256 * rpb) * 2
        report("FUSED rds backend", dt, b_min, flops=flops_banded)
        del fm3
    except ImportError:
        pass

    # ---- stacked PLL (2 lanes) ----
    pin = jax.jit(lambda k: jax.random.normal(k, (B, C, 2, n_if)))(key)
    jax.block_until_ready(pin)

    def pll_body(c, x):
        i, q, c2 = pll.pll(x, c,
                           freq=np.array([19e3, 114e3], np.float32),
                           fs=cfg.if_fs,
                           nco_scale=np.array([2.0, 0.5], np.float32),
                           norm_bandwidth=np.array([0.01, 0.001],
                                                   np.float32))
        return c2, i
    dt = bench_scan(pll_body, pll.init_state((C, 2)), pin)
    report("PLL x2 lanes", dt, B * C * 2 * n_if * f32 * 2,
           flops=B * C * 2 * n_if * 10)
    del pin

    # ---- full chain for reference ----
    state = receiver.init_state(cfg, batch=(C,))
    blk = jax.jit(lambda k: jax.random.randint(
        k, (B, C, cfg.block_size), 0, 256, jnp.uint8))(key)
    jax.block_until_ready(blk)

    def full_body(s, b):
        s, o = receiver.receiver_step(params, s, b, cfg, precision=P)
        return s, (o.mono, o.rds_symbols)
    dt = bench_scan(full_body, state, blk)
    report("FULL chain", dt,
           B * C * (cfg.block_size
                    + (3 * cfg.audio_per_block
                       + cfg.rds_symbols_per_block) * f32))

    print(f"\ndevice: {dev.device_kind}  peak HBM: {peak:.0f} GB/s  "
          f"C={C} B={B} precision={os.environ.get('ROOF_PRECISION', 'default')}"
          f"  dispatch floor {floor * 1e3:.1f} ms (subtracted)")
    print(f"{'stage':24s} {'ms':>8s} {'minMB':>8s} {'GB/s':>8s} "
          f"{'%peak':>6s} {'TFLOP/s':>8s}")
    for name, ms, mb, gbs, pct, tf in rows:
        print(f"{name:24s} {ms:8.2f} {mb:8.1f} {gbs:8.1f} {pct:6.1f} "
              f"{tf:8.2f}")


if __name__ == "__main__":
    main()
