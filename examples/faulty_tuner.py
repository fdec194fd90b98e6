"""Faulty-tuner walkthrough: break the capture, watch the receiver heal.

Synthesizes one stereo+RDS broadcast three ways — clean, through an
impaired tuner (LO-leakage DC + gain/phase imbalance, the model of
``ops/iqcorr.py``), and impaired + two urban multipath echoes — then
decodes each with the trackers off and on, printing the stereo
separation and RDS results side by side.  The reference consumes
captures as-is (src/iofunc.cpp:113-120); this is the framework's
answer to real front-end hardware.

    python examples/faulty_tuner.py            (CPU ok, ~1 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dy4tpu.utils import jaxenv
jaxenv.setup()

import numpy as np
import jax
import jax.numpy as jnp

from dy4tpu.config import get_mode
from dy4tpu.pipeline import receiver
from dy4tpu.rds import coding
from dy4tpu.rds.app import ApplicationLayer
from dy4tpu.rds.decoder import RDSDecoder
from dy4tpu.tx import fm

CFG = get_mode(0)
N_BLOCKS = 22
LF, RF = 800.0, 2400.0


def separation_db(outs):
    def tone_power(x, freq):
        t = np.arange(len(x)) / CFG.audio_fs
        c = x @ np.exp(-2j * np.pi * freq * t)
        return 2 * np.abs(c) ** 2 / len(x) ** 2

    left = np.asarray(outs.left)[4:].ravel()
    right = np.asarray(outs.right)[4:].ravel()
    return 10 * np.log10(min(
        tone_power(left, LF) / tone_power(left, RF),
        tone_power(right, RF) / tone_power(right, LF)))


def decode(iq, hardened: bool):
    params = receiver.make_params(CFG)
    state = receiver.init_state(CFG, with_iqcorr=hardened)
    timing = "envelope" if hardened else "peak"

    def body(s, b):
        return receiver.receiver_step(params, s, b, CFG,
                                      cdr_timing=timing)

    blocks = jnp.asarray(iq.reshape(N_BLOCKS, CFG.block_size))
    _, outs = jax.jit(lambda s, b: jax.lax.scan(body, s, b))(state,
                                                             blocks)
    app = ApplicationLayer()
    dec = RDSDecoder(on_group=app.process)
    syms = np.asarray(outs.rds_symbols)
    res = np.asarray(outs.rds_resync)
    for b in range(N_BLOCKS):
        dec.push_block(syms[b], resync=bool(res[b]))
    return separation_db(outs), app.info


def main():
    n_audio = N_BLOCKS * CFG.audio_per_block
    kw = dict(left=fm.tone(LF, CFG.audio_fs, n_audio, 0.8),
              right=fm.tone(RF, CFG.audio_fs, n_audio, 0.8),
              rds_bits=coding.make_station_bitstream(
                  0x54A7, 10, "HEAL FM ", groups=60,
                  radiotext="Faulty tuner demo"))
    fault = dict(dc_i=0.12, dc_q=-0.08, iq_gain=0.7, iq_phase_deg=25.0)
    echoes = [(24, 0.35 * np.exp(1j * 2.0)),
              (60, 0.2 * np.exp(-1j * 0.7))]
    captures = [
        ("clean tuner", fm.synthesize(CFG, N_BLOCKS, **kw)),
        ("impaired tuner", fm.synthesize(CFG, N_BLOCKS, **fault, **kw)),
        ("impaired + multipath",
         fm.synthesize(CFG, N_BLOCKS, multipath=echoes, **fault, **kw)),
    ]
    print(f"{'capture':>22} | {'stock sep':>9} | {'hardened':>9} | RDS")
    for name, iq in captures:
        sep0, _ = decode(iq, hardened=False)
        sep1, info = decode(iq, hardened=True)
        print(f"{name:>22} | {sep0:7.1f}dB | {sep1:7.1f}dB | "
              f"PI={info.pi_hex} PS={info.ps_name!r}")
    print("\nhardened = --iqcorr (blind ellipse-fit DC/imbalance "
          "correction) + --cdr envelope")
    wideband_demo()


def wideband_demo():
    """Round-5 twin: the WIDEBAND tuner fault.  A strong station's
    image lands in its MIRRORED channel (-c mod C), drowning a weak
    victim there — invisible to the per-channel tracker, fixed by the
    pre-bank corrector folded into the channel bank's DFT matrices
    (`dy4tpu-wideband --iqcorr`)."""
    from dy4tpu.ops import iqcorr
    from dy4tpu.pipeline import wideband

    c, n_steps, station = 8, 10, 2
    mirror = (-station) % c
    n_audio = n_steps * CFG.audio_per_block
    wb = fm.synthesize_wideband(
        CFG, c, n_steps,
        stations={station: dict(
                      left=fm.tone(LF, CFG.audio_fs, n_audio, 0.7),
                      right=fm.tone(RF, CFG.audio_fs, n_audio, 0.7),
                      station_amp=0.55),
                  mirror: dict(
                      left=fm.tone(600.0, CFG.audio_fs, n_audio, 0.7),
                      right=fm.tone(1900.0, CFG.audio_fs, n_audio, 0.7),
                      station_amp=0.12)},
        kf=50e3)
    x = wb.astype(np.float64)
    i = (x[0::2] - 128.0) / 128.0
    q = (x[1::2] - 128.0) / 128.0
    ii, qi = iqcorr.impair(i, q, gain=1.2, phase_deg=8.0,
                           dc_i=0.03, dc_q=-0.02)
    bad = np.empty_like(x)
    bad[0::2] = np.clip(np.round(ii * 128.0 + 128.0), 0, 255)
    bad[1::2] = np.clip(np.round(qi * 128.0 + 128.0), 0, 255)
    bad = bad.astype(np.uint8)

    params = receiver.make_params(CFG)
    chan = wideband.make_wideband(CFG, c)

    def run(capture, corr_on):
        st = wideband.wideband_init(CFG, chan, with_rds=False,
                                    iqcorr=corr_on)
        blocks = jnp.asarray(
            capture.reshape(n_steps, 2 * c * CFG.if_per_block))
        _, outs = jax.jit(lambda s, b: wideband.run_wideband_blocks(
            params, chan, s, b, CFG, with_rds=False))(st, blocks)

        def tone_power(xx, freq):
            t = np.arange(len(xx)) / CFG.audio_fs
            cc = xx @ np.exp(-2j * np.pi * freq * t)
            return 2 * np.abs(cc) ** 2 / len(xx) ** 2
        left = np.asarray(outs.rx.left)[4:, mirror].ravel()
        right = np.asarray(outs.rx.right)[4:, mirror].ravel()
        sep = 10 * np.log10(min(
            tone_power(left, 600.0) / tone_power(left, 1900.0),
            tone_power(right, 1900.0) / tone_power(right, 600.0)))
        return sep

    print(f"\nwideband: strong station ch{station}, weak victim in its "
          f"mirror ch{mirror} (victim stereo separation)")
    print(f"{'capture':>22} | {'stock sep':>9} | {'--iqcorr':>9}")
    for name, cap in (("clean wideband tuner", wb),
                      ("impaired (image!)", bad)):
        print(f"{name:>22} | {run(cap, False):7.1f}dB | "
              f"{run(cap, True):7.1f}dB")


if __name__ == "__main__":
    main()
