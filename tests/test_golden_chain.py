"""FULL-CHAIN golden parity: execute the reference model's complete block
loop (/root/reference/model/fmMonoBlock.py:611-773 — RF front end + mono +
stereo + full RDS) on a shared synthesized capture and compare the *chain*
outputs against ``receiver_step`` (VERDICT r2 item 2).

test_golden_reference.py pins every component; this closes the loop on the
composed receiver.  The reference runs unmodified in a subprocess: its
hardcoded ``in_fname = "../data/2400.raw"`` / ``../data/*.wav|png`` paths
are satisfied by a sandbox cwd, so no reference source is patched or
copied.

Comparison discipline (the explicit per-stage bounds):

* **Matched-demod audio** — the reference *model* chain demodulates with
  the phase-unwrap arctan (fmMonoBlock.py:628, il_vs_th=1) while its own
  C++ real-time chain uses the differentiator (src/filter.cpp:85-102).
  With ``demod_kind="arctan"`` our chain must match the executed model to
  >= 55 dB SNR per stereo channel (measured 71.5/71.6 dB — the residual
  is the reference's own int16 WAV quantization).
* **Production-demod audio** — with the production differentiator the
  measured chain SNR vs the arctan model is 25.6/26.4 dB, and the demod
  stage ALONE measures 24.7 dB on this capture (sin(dphi) vs dphi at
  phase steps up to ~3 rad): the gap is internal to the reference, not
  ours.  Bound: >= 20 dB and >= (demod-stage SNR - 3 dB).
* **RDS decisions** — both chains must lock frame sync and decode the
  same station: the reference prints in-order A/B/C/D hits on a 26-bit
  cadence plus "PI code: 54A7" / "Program type: Pop Music"; ours must
  produce the same PI/PTY and back-to-back groups on a 104-bit cadence.

Skipped wholesale if the reference mount is absent.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import numpy as np
import pytest

REF_MODEL = "/root/reference/model"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_MODEL),
                                reason="reference model not mounted")

PI_CODE = 0x54A7
PTY = 10          # "Pop Music"
PS_NAME = "DY4TPU  "
N_BLOCKS = 40     # ours (153600 u8) -> exactly 16 reference blocks (384000)


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    """Synthesized mode-0 stereo+RDS broadcast, sized so our block count
    and the reference's (sps*RDS_decim*rf_decim*audio_decim*2*2 = 384000
    u8, fmMonoBlock.py:569) both divide it."""
    from dy4tpu.config import get_mode
    from dy4tpu.rds import coding
    from dy4tpu.tx import fm

    cfg = get_mode(0)
    assert (N_BLOCKS * cfg.block_size) % 384000 == 0
    n_audio = N_BLOCKS * cfg.audio_per_block
    bits = coding.make_ps_bitstream(PI_CODE, PTY, PS_NAME, repeats=40)
    iq = fm.synthesize(
        cfg, N_BLOCKS,
        left=fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.7),
        right=fm.tone(2400.0, cfg.audio_fs, n_audio, amp=0.7),
        rds_bits=bits)
    path = tmp_path_factory.mktemp("capture") / "2400.raw"
    np.asarray(iq, np.uint8).tofile(path)
    return cfg, str(path)


@pytest.fixture(scope="module")
def reference_run(capture, tmp_path_factory):
    """Execute the reference's full block loop on the capture; returns
    (stereo_wav_float [n, 2], stdout)."""
    from scipy.io import wavfile

    _, cap_path = capture
    sandbox = tmp_path_factory.mktemp("refchain")
    run_dir = sandbox / "run"
    data_dir = sandbox / "data"
    run_dir.mkdir()
    data_dir.mkdir()
    os.link(cap_path, data_dir / "2400.raw")

    env = dict(os.environ, MPLBACKEND="Agg")
    r = subprocess.run(
        [sys.executable, os.path.join(REF_MODEL, "fmMonoBlock.py")],
        cwd=run_dir, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    _, wav = wavfile.read(data_dir / "fmMonoBlock.wav")
    # undo the reference's (x/2)*32767 s16 quantization and drop the
    # np.empty(1) garbage sample its stream is seeded with
    # (fmMonoBlock.py:485-486, :781)
    ref = wav.astype(np.float64) / 32767.0 * 2.0
    return ref[1:], r.stdout


def _run_ours(cfg, cap_path, demod_kind):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dy4tpu.pipeline import receiver

    raw = np.fromfile(cap_path, np.uint8)
    blocks = jnp.asarray(raw.reshape(N_BLOCKS, cfg.block_size))
    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg)

    @jax.jit
    def run(state, blocks):
        def body(st, blk):
            st, out = receiver.receiver_step(params, st, blk, cfg,
                                             demod_kind=demod_kind)
            return st, (out.mono, out.left, out.right, out.rds_symbols,
                        out.rds_resync)
        return lax.scan(body, state, blocks)

    _, (mono, left, right, syms, resync) = run(state, blocks)
    return (np.asarray(mono).ravel(), np.asarray(left).ravel(),
            np.asarray(right).ravel(), np.asarray(syms),
            np.asarray(resync))


@pytest.fixture(scope="module")
def ours_arctan(capture):
    cfg, cap_path = capture
    return _run_ours(cfg, cap_path, "arctan")


@pytest.fixture(scope="module")
def ours_production(capture):
    cfg, cap_path = capture
    return _run_ours(cfg, cap_path, "diff")


def _snr_db(ref, ours, skip):
    n = min(len(ref), len(ours))
    a, b = ref[skip:n], ours[skip:n]
    return 10 * np.log10(np.sum(a**2) / max(np.sum((a - b)**2), 1e-30))


# two reference blocks of PLL/filter transient (3840 audio samples each)
SKIP = 2 * 3840


def test_chain_audio_parity_matched_demod(reference_run, ours_arctan):
    """Same-demod chains must agree to fp32/quantization level: every
    stage of the composed receiver (RF FIR, decim, delay, BPFs, PLL,
    mixing, resamplers, L/R matrix) lines up sample-for-sample with the
    executed reference loop."""
    ref, _ = reference_run
    mono, left, right, _, _ = ours_arctan
    snr_l = _snr_db(ref[:, 0], left, SKIP)
    snr_r = _snr_db(ref[:, 1], right, SKIP)
    assert snr_l > 55 and snr_r > 55, (snr_l, snr_r)
    # mono = (L+R)/2 reconstructs the reference's audio_block path
    snr_m = _snr_db((ref[:, 0] + ref[:, 1]) / 2, mono, SKIP)
    assert snr_m > 55, snr_m
    # and alignment is exact: a one-sample shift must measurably hurt
    assert _snr_db(ref[:, 0], np.roll(left, 1), SKIP) < snr_l - 20


def test_chain_audio_parity_production_demod(reference_run,
                                             ours_production, capture):
    """The production differentiator chain vs the arctan model chain:
    bounded by the reference's OWN demod discrepancy (its C++ uses the
    differentiator, its model uses arctan), measured per-stage here."""
    sys.path.insert(0, REF_MODEL)
    import matplotlib
    matplotlib.use("Agg")
    from scipy import signal as sp_signal

    import fmSupportLib as ref_lib

    cfg, cap_path = capture
    ref, _ = reference_run
    _, left, right, _, _ = ours_production
    snr_l = _snr_db(ref[:, 0], left, SKIP)
    snr_r = _snr_db(ref[:, 1], right, SKIP)

    # demod-stage-only discrepancy on this capture (arctan vs diff)
    raw = np.fromfile(cap_path, np.uint8)
    iq = (np.float32(raw) - 128.0) / 128.0
    rf = sp_signal.firwin(cfg.num_taps, cfg.rf_fc / (cfg.rf_fs / 2),
                          window="hann")
    i_ds = sp_signal.lfilter(rf, 1.0, iq[0::2])[::cfg.rf_decim]
    q_ds = sp_signal.lfilter(rf, 1.0, iq[1::2])[::cfg.rf_decim]
    fm_at, _ = ref_lib.fmDemodArctan(i_ds, q_ds, 0)
    di = np.diff(i_ds, prepend=0.0)
    dq = np.diff(q_ds, prepend=0.0)
    den = i_ds**2 + q_ds**2
    fm_diff = np.where(den == 0, 0.0,
                       (i_ds * dq - q_ds * di) / np.where(den == 0, 1, den))
    demod_snr = _snr_db(fm_at, fm_diff, 200)

    assert snr_l > 20 and snr_r > 20, (snr_l, snr_r)
    # the chain gap must be explained by the demod stage, not accumulate
    # further error downstream (audio LPF removes some demod distortion,
    # so chain SNR may exceed demod SNR; it must not fall far below it)
    assert snr_l > demod_snr - 3 and snr_r > demod_snr - 3, (
        snr_l, snr_r, demod_snr)


def test_chain_rds_decisions_match(reference_run, ours_production):
    """Both chains frame-lock on the same capture and decode the same
    station data: the reference prints in-order block hits on the RBDS
    26-bit cadence plus PI/PTY; our symbol stream must yield the same
    PI/PTY/PS and back-to-back (104-bit cadence) groups."""
    from dy4tpu.rds.app import ApplicationLayer
    from dy4tpu.rds.decoder import RDSDecoder

    _, stdout = reference_run
    # --- reference side: frame-sync decisions from its own prints ---
    assert f"PI code: {PI_CODE:04X}" in stdout
    assert "Program type: Pop Music" in stdout
    hits = re.findall(r"Block type (\w+) found! Bit position\s+(\d+)",
                      stdout)
    assert len(hits) >= 12, f"reference locked only {len(hits)} blocks"
    pos = np.array([int(p) for _, p in hits])
    kinds = [k for k, _ in hits]
    # in-order A->B->C->D on a 26-bit cadence once locked
    assert (np.diff(pos) == 26).mean() > 0.8, pos
    order = {"A": 0, "B": 1, "C": 2, "D": 3}
    steps = [(order[b] - order[a]) % 4 for a, b in zip(kinds, kinds[1:])]
    assert steps.count(1) >= len(steps) - 1, kinds

    # --- our side: decode the same stream's symbols ---
    _, _, _, syms, resync = ours_production
    app = ApplicationLayer()
    dec = RDSDecoder(on_group=app.process)
    for b in range(N_BLOCKS):
        dec.push_block(syms[b], resync=bool(resync[b]))
    assert app.info.pi_hex == f"{PI_CODE:04X}"
    assert app.info.pty_name == "Pop Music"
    assert (app.info.ps_name or "").strip() == PS_NAME.strip()
    assert app.info.groups_seen >= 10
    gpos = np.array([g.bit_position for g in dec.groups])
    assert (np.diff(gpos) == 104).mean() > 0.8, gpos
