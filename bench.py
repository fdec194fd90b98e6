"""Benchmark: mode-0 full-chain (mono+stereo+RDS DSP) IQ throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MS/s", "vs_baseline": N,
   "mode1_ms_s": ..., "mode2_ms_s": ..., "mode3_ms_s": ...,
   "wideband_ms_s": ..., "wideband_bands_rt": ...,
   "sharded_eff_1dev": ..., "sharded_ms_s": ...}

(the scoreboard keys — VERDICT r4 item 2 — are captured on the same
default run at serving geometry so the non-default claims are
driver-verified every round; BENCH_SCOREBOARD=0 restores the
single-metric run)

``value`` is complex-IQ megasamples/s through the complete per-block
receiver on one chip (batched over channels, scanned over blocks).
``vs_baseline`` is the real-time factor vs the reference contract of one
station at 2.4 MS/s (constraints pdf p.2) — the reference C++ on an RPi 4
runs ~1x real time for one station with no RDS; BASELINE.md's north-star
target is >=62.5x per chip (1000x on 16 chips).

Self-validating (VERDICT r1 item 8): the timed input is a *synthesized
stereo+RDS broadcast*, not noise, and before printing the JSON line the
same run's outputs must pass stereo tone separation (>15 dB) and RDS
PI/PS recovery on a probe channel — the headline number implies decode
correctness every round.

Modes (env BENCH_MODE):
  chain    (default) single-chip full-chain throughput
  sharded  time-sharded ShardedReceiver across all visible devices;
           reports scaling efficiency vs the plain sequential scan
           (BASELINE scaling protocol, VERDICT r1 item 2)
  wideband channelizer front door: B wideband band captures ->
           B x C_bank stations through one step (BENCH_WB_CHANNELS
           bank size, BENCH_WB_BATCH bands); value = wideband complex
           MS/s, vs_baseline = whole FM bands decoded in real time

Other knobs: BENCH_RADIO_MODE (0-3: which reference mode's chain to
bench — RDS validation applies to the RDS-capable modes 0/2),
BENCH_CHANNELS, BENCH_BLOCKS, BENCH_REPEATS, BENCH_PRECISION
(default|high|highest), BENCH_VALIDATE=0 to skip the decode asserts
(debug only), BENCH_IQCORR=1 (A/B the blind tuner-fault tracker:
measured -0.4%, free).  The serving-path A/B env knobs apply too:
DY4TPU_FRONTEND/BACKEND/RDS_BACKEND (fused|stock),
DY4TPU_PLL_SPAN=K (opt-in decimated feedback, +8% at K=16),
DY4TPU_CDR=envelope (whole-block RDS timing, -0.2% = free).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

from dy4tpu.utils import jaxenv
jaxenv.setup()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dy4tpu.config import get_mode
from dy4tpu.pipeline import receiver

PI_CODE = 0x54A7
PS_NAME = "DY4TPU  "


def _precision():
    return {"default": lax.Precision.DEFAULT,
            "high": lax.Precision.HIGH,
            "highest": lax.Precision.HIGHEST}[
        os.environ.get("BENCH_PRECISION", "default")]


def _capture_cache(key: str, make):
    """Disk-cache the deterministic synthesized captures: host-side
    multiplex synthesis is ~30-60 s per config and dominates the
    scoreboard's wall clock.  The key embeds a hash of the TX sources,
    so any synthesis change invalidates automatically."""
    import hashlib

    from dy4tpu.rds import coding
    from dy4tpu.tx import fm

    h = hashlib.sha1()
    for mod in (fm, coding):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    d = os.path.expanduser("~/.cache/dy4tpu-bench")
    path = os.path.join(d, f"{key}-{h.hexdigest()[:12]}.npy")
    try:
        if os.path.exists(path):
            return np.load(path)
    except Exception:
        pass
    arr = make()
    try:
        os.makedirs(d, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        np.save(tmp, arr)
        os.replace(tmp, path)
    except Exception:
        pass   # cache is an optimization only
    return arr


def _broadcast_blocks(cfg, n_blocks: int, channels: int):
    """Synthesized broadcast, tiled to [n_blocks, C, block] on device."""
    from dy4tpu.rds import coding
    from dy4tpu.tx import fm

    def make():
        n_audio = n_blocks * cfg.audio_per_block
        bits = None
        if cfg.supports_rds:
            bits = coding.make_ps_bitstream(PI_CODE, 10, PS_NAME,
                                            repeats=max(2, n_blocks))
        return fm.synthesize(
            cfg, n_blocks,
            left=fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.7),
            right=fm.tone(2400.0, cfg.audio_fs, n_audio, amp=0.7),
            rds_bits=bits)

    base = _capture_cache(f"chain-m{cfg.mode}-b{n_blocks}", make)
    one = jnp.asarray(base.reshape(n_blocks, cfg.block_size))  # ~5 MB push

    @jax.jit
    def tile(x):
        # materialized [n_blocks, C, block] buffer: every channel is a
        # real HBM stream for the bandwidth measurement
        return jnp.broadcast_to(x[:, None, :],
                                (n_blocks, channels,
                                 cfg.block_size)) + jnp.uint8(0)

    iq = tile(one)
    jax.block_until_ready(iq)
    return iq


def _validate(cfg, outs, n_blocks: int) -> None:
    """Stereo separation + (when the mode has RDS) PI/PS recovery on
    probe channel 0."""
    from dy4tpu.rds.app import ApplicationLayer
    from dy4tpu.rds.decoder import RDSDecoder

    mono, left, right, syms, resync = (
        np.asarray(o) if o is not None else None for o in outs)
    l = left[3:, 0].ravel()
    r = right[3:, 0].ravel()
    t = np.arange(len(l)) / cfg.audio_fs
    probe = lambda x, f: np.abs(x @ np.exp(-2j * np.pi * f * t)) / len(x)  # noqa: E731
    sep_l = 20 * np.log10(probe(l, 800.0) / max(probe(l, 2400.0), 1e-12))
    sep_r = 20 * np.log10(probe(r, 2400.0) / max(probe(r, 800.0), 1e-12))
    assert sep_l > 15 and sep_r > 15, (
        f"stereo separation failed: L={sep_l:.1f} dB R={sep_r:.1f} dB")

    if not cfg.supports_rds:
        print(f"validated: sep L/R {sep_l:.1f}/{sep_r:.1f} dB "
              f"(no RDS in this mode)", file=sys.stderr)
        return
    app = ApplicationLayer()
    dec = RDSDecoder(on_group=app.process)
    for b in range(n_blocks):
        dec.push_block(syms[b, 0], resync=bool(resync[b, 0]))
    assert app.info.pi_hex == f"{PI_CODE:04X}", (
        f"PI not recovered: {app.info.pi_hex} (groups={app.info.groups_seen})")
    if n_blocks >= 24:  # PS needs all 4 segments decoded
        assert (app.info.ps_name or "").strip() == PS_NAME.strip(), (
            app.info.ps_name)
    print(f"validated: sep L/R {sep_l:.1f}/{sep_r:.1f} dB, "
          f"PI={app.info.pi_hex} PS={app.info.ps_name!r} "
          f"({app.info.groups_seen} groups)", file=sys.stderr)


def _time_chain(radio_mode: int, channels: int, n_blocks: int,
                repeats: int, precision, validate: bool) -> float:
    """Compile + time one mode's chain; returns IQ MS/s."""
    cfg = get_mode(radio_mode)
    params = receiver.make_params(cfg)
    # BENCH_IQCORR=1: A/B the blind DC/IQ-imbalance tracker's cost
    # (estimator side pass + in-kernel correction epilogue)
    state = receiver.init_state(
        cfg, batch=(channels,),
        with_iqcorr=os.environ.get("BENCH_IQCORR", "0") == "1")
    iq = _broadcast_blocks(cfg, n_blocks, channels)

    @jax.jit
    def run(state, blocks):
        def body(st, blk):
            st, out = receiver.receiver_step(params, st, blk, cfg,
                                             precision=precision)
            return st, (out.mono, out.left, out.right, out.rds_symbols,
                        out.rds_resync)
        return lax.scan(body, state, blocks)

    # warm-up / compile; this fresh-state pass also provides the decode
    # outputs for validation
    st, outs = run(state, iq)
    np.asarray(outs[0][..., :1])   # real sync (see _fetch note below)
    if validate and n_blocks >= 16:
        _validate(cfg, outs, n_blocks)

    # Timing: through the axon tunnel jax.block_until_ready returns
    # before remote execution finishes, so per-iteration timing lies.
    # Instead chain `repeats` dependent dispatches (the carried state
    # serialises them) and force ONE tiny host fetch at the end — the
    # fetch blocks until the whole chain has executed.
    t0 = time.perf_counter()
    for _ in range(repeats):
        st, outs = run(st, iq)
    _fetch = np.asarray(outs[0][..., :1])
    wall = time.perf_counter() - t0

    best = wall / repeats
    iq_samples = n_blocks * channels * cfg.iq_per_block  # complex samples
    return iq_samples / best / 1e6


def bench_chain() -> None:
    radio_mode = int(os.environ.get("BENCH_RADIO_MODE", 0))
    cfg = get_mode(radio_mode)
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    channels = int(os.environ.get("BENCH_CHANNELS", 512 if on_tpu else 2))
    # 64 blocks = 1.7 s of stream per scan: measured saturation point of
    # the dispatch-amortisation curve (32: 15.0-15.2, 48: 15.6, 64: 16.5,
    # 96: 16.6 GS/s) and still a realistic serving batch
    n_blocks = int(os.environ.get("BENCH_BLOCKS", 64 if on_tpu else 2))
    repeats = int(os.environ.get("BENCH_REPEATS", 5 if on_tpu else 2))
    # DEFAULT (bf16-input matmul) is the production-serving configuration:
    # benchmarks/precision_check.py measures bit-identical RDS symbols and
    # equal stereo separation vs HIGHEST on the synthesized broadcast.
    precision = _precision()
    validate = os.environ.get("BENCH_VALIDATE", "1") != "0"

    msps = _time_chain(radio_mode, channels, n_blocks, repeats, precision,
                       validate)
    rt = msps * 1e6 / cfg.rf_fs  # x-real-time (stations decoded live)
    result = {
        "metric": f"mode{radio_mode}_full_chain_iq_throughput_per_chip",
        "value": round(msps, 3),
        "unit": "MS/s",
        "vs_baseline": round(rt, 2),
    }

    # Scoreboard (VERDICT r4 item 2): the default driver run also
    # captures per-mode points and a wideband pass so the non-default
    # claims stop being builder-self-reported.  Serving geometry with
    # fewer repeats (shorter scans measured -20..-35% low from
    # unamortised dispatch, so they would not confirm anything); the
    # graphs hit the persistent compile cache after the first run.
    # BENCH_SCOREBOARD=0 disables (and non-default bench configs skip).
    scoreboard = (on_tpu and radio_mode == 0
                  and os.environ.get("BENCH_SCOREBOARD", "1") != "0"
                  and "BENCH_CHANNELS" not in os.environ
                  and "BENCH_BLOCKS" not in os.environ)
    if scoreboard:
        for m in (1, 2, 3):
            try:
                # repeats=4: 2 repeats measured 5-15% low (the fixed
                # dispatch tail stops amortising); extra repeats cost
                # device-milliseconds, the wall cost of the scoreboard
                # is synthesis + executable reload per distinct graph
                v = _time_chain(m, channels, n_blocks, 4, precision,
                                validate)
                result[f"mode{m}_ms_s"] = round(v, 1)
            except Exception as e:  # noqa: BLE001 — extras never kill
                result[f"mode{m}_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            wb_msps, bands_rt = _time_wideband(
                c_bank=16, batch=32, n_steps=32, repeats=4,
                precision=precision, validate=validate)
            result["wideband_ms_s"] = round(wb_msps, 1)
            result["wideband_bands_rt"] = round(bands_rt, 1)
        except Exception as e:  # noqa: BLE001
            result["wideband_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            # exact time-sharded stream vs plain scan, one chip (the
            # round-5 sub-block-halo + params-closure result)
            eff, sh_msps, _, _ = _time_sharded(128, 6, 4, precision)
            result["sharded_eff_1dev"] = round(eff, 3)
            result["sharded_ms_s"] = round(sh_msps, 1)
        except Exception as e:  # noqa: BLE001
            result["sharded_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(result))


def _time_wideband(c_bank: int, batch: int, n_steps: int, repeats: int,
                   precision, validate: bool) -> tuple[float, float]:
    """Compile + time the channelizer front door; returns (wideband IQ
    MS/s, whole FM bands decoded in real time)."""
    from dy4tpu.pipeline import wideband
    from dy4tpu.rds import coding
    from dy4tpu.tx import fm

    cfg = get_mode(0)
    station = min(3, c_bank - 1)

    def make():
        n_audio = n_steps * cfg.audio_per_block
        bits = coding.make_ps_bitstream(PI_CODE, 10, PS_NAME,
                                        repeats=max(2, n_steps))
        return fm.synthesize_wideband(
            cfg, c_bank, n_steps,
            stations={station: dict(
                left=fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.7),
                right=fm.tone(2400.0, cfg.audio_fs, n_audio, amp=0.7),
                rds_bits=bits)})

    wb = _capture_cache(f"wb-c{c_bank}-s{n_steps}", make)
    step_u8 = 2 * c_bank * cfg.if_per_block
    one = jnp.asarray(wb.reshape(n_steps, step_u8))

    @jax.jit
    def tile(x):
        return jnp.broadcast_to(x[:, None, :],
                                (n_steps, batch, step_u8)) + jnp.uint8(0)

    blocks = tile(one)
    jax.block_until_ready(blocks)

    params = receiver.make_params(cfg)
    chan = wideband.make_wideband(cfg, c_bank)
    # BENCH_IQCORR=1 in wideband mode A/Bs the PRE-BANK tuner-fault
    # tracker (strided raw moments + channel-domain correction)
    state = wideband.wideband_init(
        cfg, chan, batch=(batch,),
        iqcorr=os.environ.get("BENCH_IQCORR", "0") == "1")

    @jax.jit
    def run(state, blocks):
        def body(st, blk):
            st, out = wideband.wideband_step(params, chan, st, blk, cfg,
                                             precision=precision)
            rx = out.rx
            return st, (rx.mono, rx.left, rx.right, rx.rds_symbols,
                        rx.rds_resync)
        return lax.scan(body, state, blocks)

    st, outs = run(state, blocks)
    np.asarray(outs[0][..., :1])
    if validate and n_steps >= 16:
        # probe batch 0, the live station's channel: same bar as chain
        probe = tuple(o[:, 0, station:station + 1] for o in outs)
        _validate(cfg, probe, n_steps)

    t0 = time.perf_counter()
    for _ in range(repeats):
        st, outs = run(st, blocks)
    _fetch = np.asarray(outs[0][..., :1])
    wall = time.perf_counter() - t0

    best = wall / repeats
    wb_samples = n_steps * batch * c_bank * cfg.if_per_block
    msps = wb_samples / best / 1e6
    bands_rt = msps * 1e6 / (c_bank * cfg.if_fs)
    print(f"wideband: {batch} bands x {c_bank} ch x {n_steps} steps; "
          f"{msps:.0f} MS/s wideband IQ = {bands_rt:.1f} bands "
          f"({batch * c_bank} stations) live", file=sys.stderr)
    return msps, bands_rt


def bench_wideband() -> None:
    """Channelizer front door: B wideband captures (C_bank stations
    each) through `wideband_step` — filter bank + B*C_bank full
    receivers in one jitted scan.  Self-validating like the chain
    bench: stereo separation + RDS PI/PS on a probe station."""
    on_tpu = jax.devices()[0].platform == "tpu"
    c_bank = int(os.environ.get("BENCH_WB_CHANNELS", 16))
    batch = int(os.environ.get("BENCH_WB_BATCH", 32 if on_tpu else 1))
    n_steps = int(os.environ.get("BENCH_BLOCKS", 32 if on_tpu else 2))
    repeats = int(os.environ.get("BENCH_REPEATS", 5 if on_tpu else 2))
    msps, bands_rt = _time_wideband(
        c_bank, batch, n_steps, repeats, _precision(),
        os.environ.get("BENCH_VALIDATE", "1") != "0")
    print(json.dumps({
        "metric": f"wideband_channelizer_{c_bank}ch_iq_throughput_per_chip",
        "value": round(msps, 3),
        "unit": "MS/s",
        "vs_baseline": round(bands_rt, 2),
    }))


def _time_sharded(channels: int, s_blocks: int, repeats: int,
                  precision) -> tuple[float, float, float, int]:
    """Scaling protocol: exact time-sharded receiver over all visible
    devices vs the plain sequential scan on one device.

    efficiency = sharded_throughput / (n_time_shards * plain_throughput):
    1.0 means perfect time-axis scaling; on a single chip this measures
    pure sharding overhead (halo + replay + split-stage schedule).
    Returns ``(efficiency, sharded MS/s, plain MS/s, n_dev)``.
    """
    from dy4tpu.parallel import ShardedReceiver, make_mesh

    cfg = get_mode(0)
    devs = jax.devices()
    n_dev = len(devs)
    total_blocks = n_dev * s_blocks

    params = receiver.make_params(cfg)
    key = jax.random.PRNGKey(0)
    iq = jax.jit(lambda k: jax.random.randint(
        k, (channels, total_blocks * cfg.block_size), 0, 256,
        jnp.uint8))(key)
    jax.block_until_ready(iq)

    # (timing note: block_until_ready does not synchronise through the
    # axon tunnel — chain dependent dispatches and end with one tiny
    # host fetch, which does block until the chain completes)

    # plain sequential scan (1 device)
    state = receiver.init_state(cfg, batch=(channels,))
    blocks = jnp.moveaxis(
        iq.reshape(channels, total_blocks, cfg.block_size), 1, 0)

    @jax.jit
    def plain(st, bl):
        def body(s, b):
            s, o = receiver.receiver_step(params, s, b, cfg,
                                          precision=precision)
            return s, (o.mono, o.rds_symbols)
        return lax.scan(body, st, bl)

    st, out = plain(state, blocks)
    np.asarray(out[0][..., :1])
    t0 = time.perf_counter()
    for _ in range(repeats):
        st, out = plain(st, blocks)
    np.asarray(out[0][..., :1])
    t_plain = (time.perf_counter() - t0) / repeats

    # exact time-sharded step over all devices (the carry is donated, so
    # thread it through the timing loop like a real stream would)
    mesh = make_mesh(ch=1, time=n_dev)
    # BENCH_REPLAY=replicated reverts to the pre-r3 replicated PLL/CDR
    # replay for A/B against the channel-parallel (all_to_all) one;
    # BENCH_OVERLAP=N forces whole-block halos (default: the round-5
    # auto sub-block halo, exact_min_halo_if)
    chan_par = os.environ.get("BENCH_REPLAY", "chan") != "replicated"
    ov = os.environ.get("BENCH_OVERLAP")
    rx = ShardedReceiver(cfg, mesh, shard_blocks=s_blocks,
                         overlap_blocks=int(ov) if ov else None,
                         precision=precision,
                         channel_parallel_replay=chan_par)
    carry = rx.init(channels)
    iq_sh = jax.device_put(iq, rx.input_sharding())
    carry, out = rx.step(params, carry, iq_sh)     # compile + warm-up
    np.asarray(out.mono[..., :1])
    t0 = time.perf_counter()
    for _ in range(repeats):
        carry, out = rx.step(params, carry, iq_sh)
    np.asarray(out.mono[..., :1])
    t_sh = (time.perf_counter() - t0) / repeats

    iq_samples = channels * total_blocks * cfg.iq_per_block
    msps_plain = iq_samples / t_plain / 1e6
    msps_sh = iq_samples / t_sh / 1e6
    eff = msps_sh / (n_dev * msps_plain)
    print(f"plain 1-dev: {msps_plain:.1f} MS/s; sharded x{n_dev} dev "
          f"(S={s_blocks}, O=1, exact): {msps_sh:.1f} MS/s; "
          f"time-scaling efficiency {eff:.3f}", file=sys.stderr)
    return eff, msps_sh, msps_plain, n_dev


def bench_sharded() -> None:
    devs = jax.devices()
    on_tpu = devs[0].platform == "tpu"
    channels = int(os.environ.get("BENCH_CHANNELS", 32 if on_tpu else 2))
    s_blocks = int(os.environ.get("BENCH_SHARD_BLOCKS", 4))
    repeats = int(os.environ.get("BENCH_REPEATS", 5 if on_tpu else 2))
    eff, msps_sh, _, n_dev = _time_sharded(channels, s_blocks, repeats,
                                           _precision())
    print(json.dumps({
        "metric": f"sharded_time_scaling_efficiency_{n_dev}dev",
        "value": round(eff, 4),
        "unit": "ratio",
        "vs_baseline": round(msps_sh, 3),
    }))


_PROBE_SRC = """
import os
from dy4tpu.utils import jaxenv
jaxenv.setup()
import jax
x = jax.numpy.ones(8).sum()
x.block_until_ready()
print("PROBE_OK", jax.devices()[0].platform)
"""


def _wait_for_backend(tries: int = 5, backoff_s: float = 60.0,
                      probe_timeout_s: float = 120.0) -> None:
    """Block until the JAX backend answers a trivial op, or raise.

    The axon TPU tunnel has two transient failure modes (VERDICT r2 #2 /
    CLAUDE.md): it can raise UNAVAILABLE at init, or it can *hang* (even
    ``jnp.ones(8).sum()`` never returns).  A hang in-process would wedge
    the whole bench, so each probe runs in a subprocess under a hard
    timeout.  In-process backend init only happens after a probe passes.
    """
    env = dict(os.environ)
    last = "no probe attempted"
    for attempt in range(tries):
        if attempt:
            print(f"bench: backend unavailable ({last}); retry "
                  f"{attempt + 1}/{tries} in {backoff_s:.0f}s",
                  file=sys.stderr)
            time.sleep(backoff_s)
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC], env=env,
                capture_output=True, text=True, timeout=probe_timeout_s,
                cwd=os.path.dirname(os.path.abspath(__file__)))
        except subprocess.TimeoutExpired:
            last = f"probe hung > {probe_timeout_s:.0f}s (tunnel wedged)"
            continue
        if r.returncode == 0 and "PROBE_OK" in r.stdout:
            return
        tail = (r.stderr or r.stdout).strip().splitlines()
        last = tail[-1][:300] if tail else f"probe rc={r.returncode}"
    raise RuntimeError(f"backend unavailable after {tries} probes: {last}")


def main() -> None:
    mode = os.environ.get("BENCH_MODE", "chain")
    try:
        _wait_for_backend()
        if mode == "sharded":
            bench_sharded()
        elif mode == "wideband":
            bench_wideband()
        else:
            bench_chain()
    except Exception as e:  # noqa: BLE001 — one JSON line, never a bare
        # traceback: the driver records stdout verbatim (VERDICT r2 #1)
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": f"mode{os.environ.get('BENCH_RADIO_MODE', 0)}"
                      "_full_chain_iq_throughput_per_chip"
                      if mode != "sharded" else
                      "sharded_time_scaling_efficiency",
            "value": 0.0,
            "unit": "MS/s" if mode != "sharded" else "ratio",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:500],
        }))
        sys.exit(1)


if __name__ == "__main__":
    main()
