"""End-to-end CLI tests: the `python -m dy4tpu` surface over real pipes.

The reference's contract: u8 IQ in, S16LE PCM out, stderr for humans
(constraints pdf p.2).  Runs in subprocesses on the CPU platform.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from dy4tpu.config import get_mode
from dy4tpu.rds import coding
from dy4tpu.tx import fm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "DY4TPU_PLATFORM": "cpu"}


def _capture(n_blocks=6, rds=False):
    cfg = get_mode(0)
    n_audio = n_blocks * cfg.audio_per_block
    left = fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.7)
    right = fm.tone(2400.0, cfg.audio_fs, n_audio, amp=0.7)
    bits = (coding.make_ps_bitstream(0xBEEF, 10, "TESTING!", repeats=40)
            if rds else None)
    return cfg, fm.synthesize(cfg, n_blocks, left=left, right=right,
                              rds_bits=bits)


def _run(args, stdin_bytes, timeout=600):
    return subprocess.run(
        [sys.executable, "-m", "dy4tpu", *args], input=stdin_bytes,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        cwd=REPO, env=ENV, timeout=timeout)


def test_cli_stereo_pipe():
    cfg, iq = _capture(6)
    p = _run(["0", "s"], iq.tobytes())
    assert p.returncode == 0, p.stderr.decode()
    pcm = np.frombuffer(p.stdout, "<i2")
    assert len(pcm) == 6 * cfg.audio_per_block * 2  # interleaved L/R
    # the 800 Hz tone must dominate the left channel after warm-up
    left = pcm[0::2][3 * cfg.audio_per_block:] / 16384.0
    t = np.arange(len(left)) / cfg.audio_fs
    p800 = np.abs(left @ np.exp(-2j * np.pi * 800.0 * t)) / len(left)
    p2400 = np.abs(left @ np.exp(-2j * np.pi * 2400.0 * t)) / len(left)
    assert p800 > 3 * p2400
    assert b"processed 6 blocks" in p.stderr


def test_cli_mono_output_length():
    cfg, iq = _capture(4)
    p = _run(["0", "m"], iq.tobytes())
    assert p.returncode == 0, p.stderr.decode()
    assert len(np.frombuffer(p.stdout, "<i2")) == 4 * cfg.audio_per_block


def test_cli_rejects_rds_on_unsupported_mode():
    p = _run(["1", "r"], b"")
    assert p.returncode == 2
    assert b"does not support RDS" in p.stderr


@pytest.mark.slow
def test_cli_rds_decodes_station():
    cfg, iq = _capture(20, rds=True)
    p = _run(["0", "r"], iq.tobytes())
    assert p.returncode == 0, p.stderr.decode()
    err = p.stderr.decode()
    assert "PI=BEEF" in err, err
    assert "TESTING!" in err, err


@pytest.mark.slow
def test_cli_stereo_plus_rds():
    """`sr` path: interleaved stereo PCM on stdout AND RDS decode on
    stderr in one run (beyond the reference's m|s|r contract)."""
    cfg, iq = _capture(20, rds=True)
    p = _run(["0", "sr"], iq.tobytes())
    assert p.returncode == 0, p.stderr.decode()
    pcm = np.frombuffer(p.stdout, "<i2")
    assert len(pcm) == 20 * cfg.audio_per_block * 2  # interleaved L/R
    left = pcm[0::2][3 * cfg.audio_per_block:] / 16384.0
    t = np.arange(len(left)) / cfg.audio_fs
    p800 = np.abs(left @ np.exp(-2j * np.pi * 800.0 * t)) / len(left)
    p2400 = np.abs(left @ np.exp(-2j * np.pi * 2400.0 * t)) / len(left)
    assert p800 > 3 * p2400
    err = p.stderr.decode()
    assert "PI=BEEF" in err, err


def test_cli_chunked_dispatch_identical_and_stdout_clean():
    """--chunk N must produce byte-identical PCM, and stdout must stay a
    pure PCM pipe even with RDS console output enabled (constraints pdf
    p.2: stderr for humans)."""
    cfg, iq = _capture(12, rds=True)
    p1 = _run(["0", "r"], iq.tobytes())
    p8 = _run(["0", "r", "--chunk", "4"], iq.tobytes())
    assert p1.returncode == 0 and p8.returncode == 0
    assert p1.stdout == p8.stdout
    # PCM length exact -> no text leaked into stdout
    assert len(p1.stdout) == 12 * cfg.audio_per_block * 2
    # stereo path too (interleaved L/R through the chunked scan)
    s1 = _run(["0", "s"], iq.tobytes())
    s8 = _run(["0", "s", "--chunk", "5"], iq.tobytes())
    assert s1.stdout == s8.stdout
    assert len(s1.stdout) == 12 * cfg.audio_per_block * 2 * 2


@pytest.mark.parametrize("mode", [1, 3])
def test_cli_other_modes_stereo(mode):
    """The non-RDS modes decode through the CLI at their own rates."""
    cfg = get_mode(mode)
    n_blocks = 5
    n_audio = n_blocks * cfg.audio_per_block
    left = fm.tone(500.0, cfg.audio_fs, n_audio, amp=0.7)
    right = fm.tone(1300.0, cfg.audio_fs, n_audio, amp=0.7)
    iq = fm.synthesize(cfg, n_blocks, left=left, right=right)
    p = _run([str(mode), "s"], iq.tobytes())
    assert p.returncode == 0, p.stderr.decode()
    pcm = np.frombuffer(p.stdout, "<i2")
    assert len(pcm) == n_blocks * cfg.audio_per_block * 2
    l = pcm[0::2][2 * cfg.audio_per_block:] / 16384.0
    t = np.arange(len(l)) / cfg.audio_fs
    want = np.abs(l @ np.exp(-2j * np.pi * 500.0 * t))
    leak = np.abs(l @ np.exp(-2j * np.pi * 1300.0 * t))
    assert want > 3 * leak, (mode, want, leak)


@pytest.mark.slow
def test_cli_rds_json_events(tmp_path):
    """--rds-json FILE: one JSON-lines event per decoded group, carrying
    the accumulated station snapshot (machine-readable twin of the
    stderr console)."""
    import json

    cfg, iq = _capture(20, rds=True)
    out = tmp_path / "events.jsonl"
    p = _run(["0", "r", "--rds-json", str(out)], iq.tobytes())
    assert p.returncode == 0, p.stderr.decode()
    events = [json.loads(line) for line in
              out.read_text().strip().splitlines()]
    assert len(events) >= 3
    last = events[-1]
    assert last["pi"] == "BEEF"
    assert last["ps"] == "TESTING!"
    assert last["pty_name"] == "Pop Music"
    assert last["groups_seen"] == len(events)
    assert all(e["group"] == "0A" for e in events)
    # snapshots grow monotonically: early events omit unset fields
    assert "ps" not in events[0] or events[0]["groups_seen"] > 1


def test_cli_mode2_peak_cdr_hint():
    """VERDICT r4 item 6: `dy4tpu 2 r` with the default (reference-
    parity) peak CDR must tell the user why RDS may barely decode and
    which flag fixes it; the hint disappears once envelope timing is
    selected (flag or env)."""
    cfg = get_mode(2)
    iq = fm.synthesize(cfg, 1)   # one block: the hint prints at startup
    p = _run(["2", "r"], iq.tobytes())
    assert p.returncode == 0, p.stderr.decode()
    assert b"--cdr envelope" in p.stderr
    p = _run(["2", "r", "--cdr", "envelope"], iq.tobytes())
    assert p.returncode == 0, p.stderr.decode()
    assert b"--cdr envelope" not in p.stderr
    env = {**ENV, "DY4TPU_CDR": "envelope"}
    p = subprocess.run([sys.executable, "-m", "dy4tpu", "2", "r"],
                       input=iq.tobytes(), stdout=subprocess.PIPE,
                       stderr=subprocess.PIPE, cwd=REPO, env=env,
                       timeout=600)
    assert p.returncode == 0, p.stderr.decode()
    assert b"--cdr envelope" not in p.stderr
    # mode 0 (SPS=16) keeps a clean startup: the hint is mode-2-specific
    cfg0, iq0 = _capture(1, rds=True)
    p = _run(["0", "r"], iq0.tobytes())
    assert p.returncode == 0, p.stderr.decode()
    assert b"--cdr envelope" not in p.stderr
