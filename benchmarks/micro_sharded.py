"""Stage breakdown of the exact time-sharded step at T=1 (the 1-chip
overhead VERDICT r4 item 3 wants explained/cut).

Times, with the honest chained-dispatch protocol, at the sharded bench's
operating point (C channels, S blocks, one device, no collectives):

  plain   — S-block scan of the fused receiver_step (the baseline)
  front   — mini + S-block scan of front_step only
  codes   — encode_sign + concat (the replay's input build)
  replay  — phase_scan_coded over the chunk + NCO trig synthesis
  back    — S-block scan of back_step (pre-computed NCO streams)
  cdr     — the per-block CDR replay scan

Usage: python benchmarks/micro_sharded.py [--channels 256] [--blocks 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from dy4tpu.utils import jaxenv  # noqa: E402
jaxenv.setup()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from dy4tpu.config import get_mode  # noqa: E402
from dy4tpu.ops import pll, trig  # noqa: E402
from dy4tpu.parallel.sharded import exact_min_halo_if  # noqa: E402
from dy4tpu.pipeline import receiver  # noqa: E402


def timed(fn, args, repeats, fetch):
    out = fn(*args)
    np.asarray(fetch(out))
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    np.asarray(fetch(out))
    return (time.perf_counter() - t0) / repeats * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()
    c, s = args.channels, args.blocks
    r = args.repeats

    cfg = get_mode(0)
    n_if = cfg.if_per_block
    halo_if = exact_min_halo_if(cfg)
    prec = lax.Precision.DEFAULT
    params = receiver.make_params(cfg)
    key = jax.random.PRNGKey(0)
    iq = jax.random.randint(key, (s, c, cfg.block_size), 0, 256, jnp.uint8)
    mini = jax.random.randint(key, (c, halo_if * 2 * cfg.rf_decim), 0,
                              256, jnp.uint8)
    jax.block_until_ready((iq, mini))

    state = receiver.init_state(cfg, batch=(c,))
    front0 = receiver.front_state_of(state)
    back0 = receiver.back_state_of(state)

    # ---- plain baseline ----
    @jax.jit
    def plain(st, bl):
        def body(s_, b):
            s_, o = receiver.receiver_step(params, s_, b, cfg,
                                           precision=prec)
            return s_, (o.mono, o.rds_symbols)
        return lax.scan(body, st, bl)

    ms, _ = timed(plain, (state, iq), r, lambda o: o[1][0][..., :1])
    iqs = s * c * cfg.iq_per_block
    print(json.dumps({"stage": "plain", "ms": round(ms, 2),
                      "ms_s": round(iqs / ms / 1e3, 1)}), flush=True)

    # ---- front ----
    @jax.jit
    def front(st, mini_, bl):
        def body(s_, b):
            s_, fo = receiver.front_step(params, s_, b, cfg,
                                         precision=prec)
            return s_, fo
        st1, _ = lax.scan(body, st, mini_[None])
        return lax.scan(body, st1, bl)

    ms, (fstate, fos) = timed(front, (front0, mini, iq), r,
                              lambda o: o[1].pilot[..., :1])
    print(json.dumps({"stage": "front(mini+S)", "ms": round(ms, 2)}),
          flush=True)
    jax.block_until_ready(fos)

    # ---- codes ----
    @jax.jit
    def codes_fn(fos_):
        def to_stream(x):
            x = jnp.moveaxis(x, 0, -2)
            return x.reshape((*x.shape[:-2], -1))
        return jnp.stack([to_stream(pll.encode_sign(fos_.pilot)),
                          to_stream(pll.encode_sign(fos_.carrier))],
                         axis=-2)

    ms, codes = timed(codes_fn, (fos,), r, lambda o: o[..., :1])
    print(json.dumps({"stage": "codes", "ms": round(ms, 2)}), flush=True)

    prev = jnp.full((c, 2, halo_if), pll.CODE_INVALID, jnp.int8)
    freq = np.array([cfg.pll_freq, cfg.rds_pll_freq], np.float32)
    bw = np.array([cfg.pll_bandwidth, cfg.rds_pll_bandwidth], np.float32)
    zl = jnp.zeros((c, 2), jnp.float32)

    # ---- replay + nco ----
    @jax.jit
    def replay(codes_, integ, pe, ang):
        codes_all = jnp.concatenate([prev, codes_], axis=-1)
        phis, carry_mid, _ = pll.phase_scan_coded(
            codes_all, (integ, pe, ang), freq=freq, fs=cfg.if_fs,
            norm_bandwidth=bw, split_at=s * n_if)
        nco = trig.nco_sincos(
            phis[..., 0, :] * jnp.float32(cfg.pll_nco_scale))[1]
        nco_q, nco_i = trig.nco_sincos(
            phis[..., 1, :] * jnp.float32(cfg.rds_pll_nco_scale))
        return nco, nco_i, nco_q, carry_mid

    ms, (nco, nco_i, nco_q, _) = timed(
        replay, (codes, zl, zl, zl), r, lambda o: o[0][..., :1])
    print(json.dumps({"stage": "replay+nco", "ms": round(ms, 2)}),
          flush=True)

    # ---- back ----
    def to_blocks(x):
        x = x[..., halo_if:]
        x = x.reshape((*x.shape[:-1], s, n_if))
        return jnp.moveaxis(x, -2, 0)

    @jax.jit
    def backf(st, fos_, nco_, nco_i_, nco_q_):
        def body(s_, inp):
            fo, nk, nik, nqk = inp
            s_, bo = receiver.back_step(params, s_, fo, nk, nik, nqk,
                                        cfg, precision=prec)
            return s_, bo
        return lax.scan(body, st,
                        (fos_, to_blocks(nco_), to_blocks(nco_i_),
                         to_blocks(nco_q_)))

    ms, (bstate, bos) = timed(backf, (back0, fos, nco, nco_i, nco_q), r,
                              lambda o: o[1].mono[..., :1])
    print(json.dumps({"stage": "back(S)", "ms": round(ms, 2)}), flush=True)
    jax.block_until_ready(bos)

    # ---- cdr ----
    cdr0 = receiver.CDRState(offset=jnp.zeros((c,), jnp.int32),
                             found=jnp.zeros((c,), bool))

    @jax.jit
    def cdrf(cst, bos_):
        bb = jnp.stack([bos_.bb_i, bos_.bb_q], axis=-2)

        def body(cs, bbk):
            _i, _q, sym, res, cs2 = receiver._cdr(
                bbk[..., 0, :], bbk[..., 1, :], cs, cfg.rds_sps)
            return cs2, (sym, res)
        return lax.scan(body, cst, bb)

    ms, _ = timed(cdrf, (cdr0, bos), r, lambda o: o[1][0][..., :1])
    print(json.dumps({"stage": "cdr", "ms": round(ms, 2)}), flush=True)


def _main_fused():
    """One-jit composition of all stages (no shard_map): isolates the
    cost of the composition itself vs the separately-jitted stages."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("cmd")
    args = ap.parse_args()
    c, s = args.channels, args.blocks
    cfg = get_mode(0)
    n_if = cfg.if_per_block
    halo_if = exact_min_halo_if(cfg)
    prec = lax.Precision.DEFAULT
    params = receiver.make_params(cfg)
    key = jax.random.PRNGKey(0)
    iq = jax.random.randint(key, (s, c, cfg.block_size), 0, 256, jnp.uint8)
    mini = jax.random.randint(key, (c, halo_if * 2 * cfg.rf_decim), 0,
                              256, jnp.uint8)
    jax.block_until_ready((iq, mini))
    state = receiver.init_state(cfg, batch=(c,))
    front0 = receiver.front_state_of(state)
    back0 = receiver.back_state_of(state)
    cdr0 = receiver.CDRState(offset=jnp.zeros((c,), jnp.int32),
                             found=jnp.zeros((c,), bool))
    prev = jnp.full((c, 2, halo_if), pll.CODE_INVALID, jnp.int8)
    freq = np.array([cfg.pll_freq, cfg.rds_pll_freq], np.float32)
    bw = np.array([cfg.pll_bandwidth, cfg.rds_pll_bandwidth], np.float32)
    zl = jnp.zeros((c, 2), jnp.float32)

    @jax.jit
    def whole(front, back, cdr, integ, pe, ang, mini_, bl):
        def fbody(s_, b):
            s_, fo = receiver.front_step(params, s_, b, cfg,
                                         precision=prec)
            return s_, fo
        st1, _ = lax.scan(fbody, front, mini_[None])
        nf, fos = lax.scan(fbody, st1, bl)

        def to_stream(x):
            x = jnp.moveaxis(x, 0, -2)
            return x.reshape((*x.shape[:-2], -1))
        codes = jnp.stack([to_stream(pll.encode_sign(fos.pilot)),
                           to_stream(pll.encode_sign(fos.carrier))],
                          axis=-2)
        codes_all = jnp.concatenate([prev, codes], axis=-1)
        phis, carry_mid, _ = pll.phase_scan_coded(
            codes_all, (integ, pe, ang), freq=freq, fs=cfg.if_fs,
            norm_bandwidth=bw, split_at=s * n_if)
        nco = trig.nco_sincos(
            phis[..., 0, :] * jnp.float32(cfg.pll_nco_scale))[1]
        nco_q, nco_i = trig.nco_sincos(
            phis[..., 1, :] * jnp.float32(cfg.rds_pll_nco_scale))

        def to_blocks(x):
            x = x[..., halo_if:]
            x = x.reshape((*x.shape[:-1], s, n_if))
            return jnp.moveaxis(x, -2, 0)

        def bbody(s_, inp):
            fo, nk, nik, nqk = inp
            s_, bo = receiver.back_step(params, s_, fo, nk, nik, nqk,
                                        cfg, precision=prec)
            return s_, bo
        nb, bos = lax.scan(bbody, back,
                           (fos, to_blocks(nco), to_blocks(nco_i),
                            to_blocks(nco_q)))
        bb = jnp.stack([bos.bb_i, bos.bb_q], axis=-2)

        def cbody(cs, bbk):
            _i, _q, sym, res, cs2 = receiver._cdr(
                bbk[..., 0, :], bbk[..., 1, :], cs, cfg.rds_sps)
            return cs2, (sym, res)
        ncdr, (sym, res) = lax.scan(cbody, cdr, bb)
        return bos.mono, sym, nf, nb, ncdr, carry_mid

    ms, _ = timed(whole,
                  (front0, back0, cdr0, zl, zl, zl, mini, iq),
                  args.repeats, lambda o: o[0][..., :1])
    iqs = s * c * cfg.iq_per_block
    print(json.dumps({"stage": "whole(one jit)", "ms": round(ms, 2),
                      "ms_s": round(iqs / ms / 1e3, 1)}), flush=True)





def _main_sm():
    """The same one-jit composition wrapped in shard_map over a 1x1
    mesh: isolates shard_map's own cost at one device."""
    from dy4tpu.parallel import make_mesh
    from dy4tpu.parallel.mesh import CH_AXIS, TIME_AXIS
    from jax.sharding import NamedSharding, PartitionSpec as P

    c, s = 256, 8
    cfg = get_mode(0)
    n_if = cfg.if_per_block
    halo_if = exact_min_halo_if(cfg)
    prec = lax.Precision.DEFAULT
    params = receiver.make_params(cfg)
    key = jax.random.PRNGKey(0)
    iq = jax.random.randint(key, (s, c, cfg.block_size), 0, 256, jnp.uint8)
    mini = jax.random.randint(key, (c, halo_if * 2 * cfg.rf_decim), 0,
                              256, jnp.uint8)
    jax.block_until_ready((iq, mini))
    state = receiver.init_state(cfg, batch=(c,))
    front0 = receiver.front_state_of(state)
    back0 = receiver.back_state_of(state)
    cdr0 = receiver.CDRState(offset=jnp.zeros((c,), jnp.int32),
                             found=jnp.zeros((c,), bool))
    prev = jnp.full((c, 2, halo_if), pll.CODE_INVALID, jnp.int8)
    freq = np.array([cfg.pll_freq, cfg.rds_pll_freq], np.float32)
    bw = np.array([cfg.pll_bandwidth, cfg.rds_pll_bandwidth], np.float32)
    zl = jnp.zeros((c, 2), jnp.float32)
    mesh = make_mesh(ch=1, time=1)

    def local(front, back, cdr, integ, pe, ang, mini_, bl):
        def fbody(s_, b):
            s_, fo = receiver.front_step(params, s_, b, cfg,
                                         precision=prec)
            return s_, fo
        st1, _ = lax.scan(fbody, front, mini_[None])
        nf, fos = lax.scan(fbody, st1, bl)

        def to_stream(x):
            x = jnp.moveaxis(x, 0, -2)
            return x.reshape((*x.shape[:-2], -1))
        codes = jnp.stack([to_stream(pll.encode_sign(fos.pilot)),
                           to_stream(pll.encode_sign(fos.carrier))],
                          axis=-2)
        codes_all = jnp.concatenate([prev, codes], axis=-1)
        phis, carry_mid, _ = pll.phase_scan_coded(
            codes_all, (integ, pe, ang), freq=freq, fs=cfg.if_fs,
            norm_bandwidth=bw, split_at=s * n_if)
        nco = trig.nco_sincos(
            phis[..., 0, :] * jnp.float32(cfg.pll_nco_scale))[1]
        nco_q, nco_i = trig.nco_sincos(
            phis[..., 1, :] * jnp.float32(cfg.rds_pll_nco_scale))

        def to_blocks(x):
            x = x[..., halo_if:]
            x = x.reshape((*x.shape[:-1], s, n_if))
            return jnp.moveaxis(x, -2, 0)

        def bbody(s_, inp):
            fo, nk, nik, nqk = inp
            s_, bo = receiver.back_step(params, s_, fo, nk, nik, nqk,
                                        cfg, precision=prec)
            return s_, bo
        nb, bos = lax.scan(bbody, back,
                           (fos, to_blocks(nco), to_blocks(nco_i),
                            to_blocks(nco_q)))
        bb = jnp.stack([bos.bb_i, bos.bb_q], axis=-2)

        def cbody(cs, bbk):
            _i, _q, sym, res, cs2 = receiver._cdr(
                bbk[..., 0, :], bbk[..., 1, :], cs, cfg.rds_sps)
            return cs2, (sym, res)
        ncdr, (sym, res) = lax.scan(cbody, cdr, bb)
        return bos.mono, sym, nf, nb, ncdr, carry_mid

    fspec = jax.tree.map(lambda _: P(None, CH_AXIS), front0)
    bspec = jax.tree.map(lambda _: P(None, CH_AXIS), back0)
    # shapes here are [C,...] not [T,C,...]: spec rank must match leaves
    fspec = jax.tree.map(lambda _: P(CH_AXIS), front0)
    bspec = jax.tree.map(lambda _: P(CH_AXIS), back0)
    cspec = receiver.CDRState(offset=P(CH_AXIS), found=P(CH_AXIS))
    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(fspec, bspec, cspec, P(CH_AXIS), P(CH_AXIS),
                  P(CH_AXIS), P(CH_AXIS), P(None, CH_AXIS)),
        out_specs=(P(None, CH_AXIS), P(None, CH_AXIS), fspec, bspec,
                   cspec, (P(CH_AXIS), P(CH_AXIS), P(CH_AXIS))),
        check_vma=False)
    whole = jax.jit(mapped)
    ms, _ = timed(whole,
                  (front0, back0, cdr0, zl, zl, zl, mini, iq),
                  5, lambda o: o[0][..., :1])
    iqs = s * c * cfg.iq_per_block
    print(json.dumps({"stage": "whole(shard_map 1x1)", "ms": round(ms, 2),
                      "ms_s": round(iqs / ms / 1e3, 1)}), flush=True)




def _main_step():
    """Time the real ShardedReceiver.step at the same point as `whole`
    to locate the step-wrapper overhead."""
    from dy4tpu.parallel import ShardedReceiver, make_mesh

    c, s = 256, 8
    cfg = get_mode(0)
    mesh = make_mesh(ch=1, time=1)
    rx = ShardedReceiver(cfg, mesh, shard_blocks=s,
                         precision=lax.Precision.DEFAULT)
    params = receiver.make_params(cfg)
    carry = rx.init(c)
    key = jax.random.PRNGKey(0)
    iq = jax.random.randint(key, (c, rx.chunk_len), 0, 256, jnp.uint8)
    iq = jax.device_put(iq, rx.input_sharding())
    jax.block_until_ready(iq)

    carry, out = rx.step(params, carry, iq)
    np.asarray(out.mono[..., :1])
    t0 = time.perf_counter()
    for _ in range(5):
        carry, out = rx.step(params, carry, iq)
    np.asarray(out.mono[..., :1])
    ms = (time.perf_counter() - t0) / 5 * 1e3
    iqs = s * c * cfg.iq_per_block
    print(json.dumps({"stage": "rx.step", "ms": round(ms, 2),
                      "ms_s": round(iqs / ms / 1e3, 1)}), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[-1] == "whole":
        _main_fused()
    elif len(sys.argv) > 1 and sys.argv[-1] == "sm":
        _main_sm()
    elif len(sys.argv) > 1 and sys.argv[-1] == "step":
        _main_step()
    else:
        main()
